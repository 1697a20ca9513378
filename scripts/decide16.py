"""Round-3 sweep #15: boids FULL-step decomposition (floor-free).

decide12: the two window accumulates cost only ~30 ms of the ~112 ms
step at 500K (2.8 ms each at 100K!) — the boids wall is elsewhere.
This times the full frozen-order step marginally, then variants with
stages disabled, to locate the remainder (pass-2 packed gathers,
merge/steer, physics, resort amortization).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.boids import BoidsConfig
from spatialsim_tpu.models.boids import (
    init_boids_window_state, make_step_fn)
from spatialsim_tpu.ops import boids_ops


def timeit(fn, reps=3):
    out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(n):
    cfg = BoidsConfig(num_boids=n, neighbor_mode="window")
    rng = np.random.default_rng(3)
    pos = jnp.asarray((rng.random((3, n)) - 0.5) * 2 * cfg.bounds,
                      jnp.float32)
    vel = jnp.asarray((rng.random((3, n)) - 0.5) * 10, jnp.float32)
    col = jnp.asarray(rng.random((3, n)), jnp.float32)
    print(f"boids n={n:,} resort_interval="
          f"{getattr(cfg, 'resort_interval', 6)}", flush=True)

    # Sustained full step (substep-chained, includes resort cadence).
    for K in (6, 24):
        # Fresh state per variant: the step donates its input buffers,
        # so a shared `st` is deleted after the first call.
        st = init_boids_window_state(pos, vel, col, cfg)
        step = make_step_fn(cfg, substeps=K)
        st2 = step(st, jnp.float32(0.02))
        np.asarray(st2.pos[0, :1])
        t0 = time.perf_counter()
        st2 = step(st2, jnp.float32(0.02))
        np.asarray(st2.pos[0, :1])
        dt_w = time.perf_counter() - t0
        print(f"  full step chain K={K}: {K/dt_w:.1f} steps/s "
              f"({dt_w/K*1e3:.1f} ms/step)", flush=True)

    # Forces-only marginal: one window pass vs two.
    st = init_boids_window_state(pos, vel, col, cfg)
    npad = st.p21.shape[0]
    fkw = dict(perception_radius=cfg.perception_radius,
               separation_radius=cfg.separation_radius,
               separation_weight=cfg.separation_weight,
               alignment_weight=cfg.alignment_weight,
               cohesion_weight=cfg.cohesion_weight,
               max_speed=cfg.max_speed, max_force=cfg.max_force,
               group_size=cfg.group_size,
               window_groups=cfg.window_groups)

    for tag, second in (("both_passes", True), ("pass1_only", False)):
        def mk(K, second=second):
            @jax.jit
            def chain(p, v, c, p21, s21):
                def body(carry, _):
                    p, v, c = carry
                    f, ac = boids_ops.flocking_forces_window_frozen(
                        p, v, c, p21, s21, second_pass=second, **fkw)
                    return (p + 1e-30 * f, v, c), None
                out, _ = jax.lax.scan(body, (p, v, c), None, length=K)
                return out[0]
            return lambda: chain(st.pos, st.vel, st.col, st.p21, st.s21)
        t1 = timeit(mk(1))
        t9 = timeit(mk(9))
        print(f"  forces [{tag}]: marginal {(t9-t1)/8*1e3:.1f} ms",
              flush=True)
    print("done_n", flush=True)


def main():
    run(500_000)
    run(100_000)
    print("done", flush=True)


if __name__ == "__main__":
    main()
