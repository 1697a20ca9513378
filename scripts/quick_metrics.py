"""Round-3 decision metrics at 1M: eval (gpp fixed), far_n tail, refresh
cost vs list capacity.  One process; prints incrementally."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import (
    build_lists, eval_accel_sorted, refresh_lists, _build_kw)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = 1_000_000
    base = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window",
        skin=2.0, rebuild_interval=48, rebuild_drift_mode="off"), n)
    print(f"n={n:,} platform={jax.devices()[0].platform}", flush=True)
    p, v, m = distributions.generate_distribution(
        "galaxy", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    acc0 = jnp.zeros_like(pos)

    for L in (6144, 2048):
        cfg = base.replace(list_capacity=L)
        kw = _build_kw(cfg)
    kw["pool_tile"] = 0   # these sweeps exercise the dense layout
        t_b = timeit(lambda: build_lists(pos, vel, mass, acc0, **kw))
        lists = build_lists(pos, vel, mass, acc0, **kw)
        fn = np.asarray(lists.far_n)
        print(f"L={L}: rebuild {t_b*1e3:.0f} ms | far_n mean={fn.mean():.0f}"
              f" p90={np.percentile(fn, 90):.0f}"
              f" p99={np.percentile(fn, 99):.0f} max={fn.max()}"
              f" at_cap={(fn >= L - 1).sum()}", flush=True)

        gsz = cfg.group_size
        pos_s = pos[:, lists.order[:n]]
        vel_s = vel[:, lists.order[:n]]
        mass_s = mass[lists.order[:n]]
        t_e = timeit(lambda: eval_accel_sorted(
            lists, pos_s, mass_s, jnp.float32(0.02), G=cfg.G,
            softening=cfg.softening, group_size=gsz,
            window_groups=cfg.window_groups, use_pallas=True))
        print(f"L={L}: eval {t_e*1e3:.1f} ms", flush=True)

        rf = jax.jit(lambda ls, ps, vs, ms, ac: refresh_lists(
            ls, ps, vs, ms, ac, 0.02, 24.0))
        t_r = timeit(lambda: rf(lists, pos_s, vel_s, mass_s, acc0))
        print(f"L={L}: refresh {t_r*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
