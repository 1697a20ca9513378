"""Round-3 sweep #3: column-kernel A/B at the two surviving configs.

decide3 verdict: gsz 128 pays 2.3-3x rebuild for no eval gain (the row
kernel is reduction-bound, not pair-bound) — G256 stays.  This run
measures the scratch-staged column kernel (old vs cols) at W2/W1 plus a
src-chunk/far-tile variation, and the refresh timing, to fix the
production config.
"""

import sys
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
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

    for wg in (2, 1):
        cfg = base.replace(group_size=256, window_groups=wg,
                           list_capacity=6144)
        kw = _build_kw(cfg)
        lists = build_lists(pos, vel, mass, acc0, **kw)
        pos_s = pos[:, lists.order[:n]]
        mass_s = mass[lists.order[:n]]
        accs = {}
        for tag, ekw in (
                ("old", dict(use_cols=False)),
                ("cols", dict(use_cols=True)),
                ("cols_t256", dict(use_cols=True, far_tile=256)),
                ("cols_gpp8", dict(use_cols=True, gpp=8)),
        ):
            ek = dict(G=cfg.G, softening=cfg.softening, group_size=256,
                      window_groups=wg, use_pallas=True, **ekw)
            try:
                t = timeit(lambda: eval_accel_sorted(
                    lists, pos_s, mass_s, jnp.float32(0.02), **ek))
                accs[tag] = np.asarray(eval_accel_sorted(
                    lists, pos_s, mass_s, jnp.float32(0.02), **ek))
                dev = (np.abs(accs[tag] - accs["old"]).max()
                       / max(np.abs(accs["old"]).max(), 1e-30)
                       if "old" in accs else float("nan"))
                print(f"W{wg} {tag}: {t*1e3:.1f} ms (dev {dev:.2e})",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"W{wg} {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
        del lists, accs
    print("done", flush=True)


if __name__ == "__main__":
    main()
