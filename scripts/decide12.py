"""Round-3 sweep #11: boids v3 kernel A/B (floor-free chained marginal).

v3 = row-source + deferred reductions + MXU target/output transposes.
Compares marginal accumulate cost (XLA oracle vs Pallas v3) at 500K and
100K agents, chained K=1 vs K=9 under one jit.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.boids import BoidsConfig
from spatialsim_tpu.models.boids import init_boids_window_state
from spatialsim_tpu.ops.boids_ops import _window_accumulate


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


def boids_part(n):
    cfg = BoidsConfig(num_boids=n, neighbor_mode="window")
    rng = np.random.default_rng(3)
    pos = jnp.asarray((rng.random((3, n)) - 0.5) * 2 * cfg.bounds,
                      jnp.float32)
    vel = jnp.asarray((rng.random((3, n)) - 0.5) * 10, jnp.float32)
    col = jnp.asarray(rng.random((3, n)), jnp.float32)
    st = init_boids_window_state(pos, vel, col, cfg)
    gsz, wg = cfg.group_size, cfg.window_groups
    npad = st.p21.shape[0]
    pad = npad - n
    ppos = jnp.concatenate(
        [st.pos, jnp.full((3, pad), 1e9, jnp.float32)], axis=1)
    pvel = jnp.pad(st.vel, ((0, 0), (0, pad)))
    pcol = jnp.pad(st.col, ((0, 0), (0, pad)))
    print(f"boids n={n:,} gsz={gsz} wg={wg} npad={npad}", flush=True)
    kw = dict(gsz=gsz, wg=wg,
              perception_sq=float(cfg.perception_radius ** 2),
              separation_sq=float(cfg.separation_radius ** 2))

    for tag, up in (("xla", False), ("pallas", True)):
        def mk(K):
            @jax.jit
            def chain(p, v, c):
                def body(carry, _):
                    p, v, c = carry
                    sep, sc_, al, coh, cs, nb = _window_accumulate(
                        p, v, c, None, use_pallas=up, **kw)
                    ng = p.shape[1] // gsz
                    d = jnp.moveaxis(sep, 0, 1).reshape(3, ng * gsz)
                    return (p + 1e-30 * d, v, c), None
                (p2, _, _), _ = jax.lax.scan(body, (p, v, c), None,
                                             length=K)
                return p2
            return chain
        try:
            c1, c9 = mk(1), mk(9)
            t1 = timeit(lambda: c1(ppos, pvel, pcol))
            t9 = timeit(lambda: c9(ppos, pvel, pcol))
            print(f"  accumulate [{tag}]: marginal "
                  f"{(t9 - t1)/8*1e3:.1f} ms (t1 {t1*1e3:.0f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  [{tag}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:220]}", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    boids_part(500_000)
    boids_part(100_000)
    print("done", flush=True)


if __name__ == "__main__":
    main()
