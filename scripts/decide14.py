"""Round-3 sweep #13: pooled engine at 1M — sustained steps/s.

Measures, floor-free: pooled eval marginal (vs decide11's dense 28 ms
at W1), refresh cost on the pool, rebuild+compaction, and the SUSTAINED
chained window step at candidate (interval, refresh) configs — the
number bench.py will report.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import (
    build_lists, init_window_state, make_window_step, refresh_lists,
    _build_kw)
from spatialsim_tpu.ops.bh_eval_kernel import pallas_window_eval_pool


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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    wg = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    print(f"platform={jax.devices()[0].platform} n={n:,} wg={wg} "
          f"B={budget or 'auto'}", flush=True)
    base = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window",
        skin=2.0, window_groups=wg, worklist_budget=budget,
        pool_tile=512, rebuild_interval=48, rebuild_drift_mode="off"),
        n)
    p, v, m = distributions.generate_distribution(
        "galaxy", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)

    kw = _build_kw(base)
    t_build, = [timeit(lambda: build_lists(
        pos, vel, mass, jnp.zeros_like(pos), **kw))]
    lists = build_lists(pos, vel, mass, jnp.zeros_like(pos), **kw)
    print(f"  rebuild+compact: {t_build*1e3:.0f} ms | pool tiles "
          f"{lists.pool.shape[0]} used "
          f"{int(np.asarray((lists.far_n + 511) // 512).sum())}",
          flush=True)

    npad = lists.order.shape[0]
    pos_s = pos[:, lists.order[:n]]
    mass_s = mass[lists.order[:n]]
    vel_s = vel[:, lists.order[:n]]
    pad = npad - n
    s_pos = jnp.concatenate(
        [pos_s, jnp.broadcast_to(pos_s[:, -1:], (3, pad))], axis=1)
    s_mass = jnp.concatenate([mass_s, jnp.zeros((pad,))])

    # Marginal pooled eval (chained K=1 vs K=9).
    def mk(K):
        @jax.jit
        def chain(sp, sm, pool, pstart, farn):
            def body(c, _):
                acc = pallas_window_eval_pool(
                    c, sm, pool, pstart, farn, lists.steps_since,
                    jnp.float32(0.02), G=base.G,
                    softening=base.softening,
                    group_size=base.group_size, window_groups=wg)
                return c + 1e-30 * acc[:, :npad], None
            out, _ = jax.lax.scan(body, sp, None, length=K)
            return out
        return lambda sp: chain(sp, s_mass, lists.pool, lists.pstart,
                                lists.far_n)
    c1, c9 = mk(1), mk(9)
    t1 = timeit(lambda: c1(s_pos))
    t9 = timeit(lambda: c9(s_pos))
    print(f"  pooled eval marginal: {(t9-t1)/8*1e3:.1f} ms", flush=True)

    # Refresh on the pool.
    t_r = timeit(lambda: refresh_lists(
        lists, s_pos[:, :n], vel_s, mass_s, jnp.zeros((3, n)),
        0.02, 24.0))
    print(f"  pool refresh: {t_r*1e3:.0f} ms (single dispatch, "
          f"~30 ms floor included)", flush=True)

    # Sustained step at candidate configs (the bench number).
    for interval, riv in ((48, 0), (48, 12), (24, 8), (96, 12)):
        cfg = base.replace(rebuild_interval=interval,
                           refresh_interval=riv)
        st = init_window_state(pos, vel, mass, cfg)
        step = make_window_step(cfg, n, substeps=interval)
        st = step(st, jnp.float32(0.02))          # warm both programs
        np.asarray(st.pos[0, :1])
        t0 = time.perf_counter()
        st = step(st, jnp.float32(0.02))
        np.asarray(st.pos[0, :1])
        dt_w = time.perf_counter() - t0
        print(f"  interval={interval} refresh={riv}: "
              f"{interval/dt_w:.1f} steps/s ({dt_w/interval*1e3:.1f} "
              f"ms/step)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
