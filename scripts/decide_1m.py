"""Round-3 production-config decision matrix at 1M bodies.

One process (the chip compiles serially — never kill mid-run); prints
incrementally.  Measures, per (near_groups K, list_capacity L, worklist
budget B) variant: rebuild ms, far_n stats, eval ms, refresh ms, and a
1024-target sampled force error vs the chunked exact oracle.
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

    rng = np.random.default_rng(1)
    idx = jnp.asarray(np.sort(rng.choice(n, 1024, replace=False)))
    soft_sq = base.softening ** 2

    @jax.jit
    def exact_at(tgt, pos, mass):
        def one(t):
            d = pos - t[:, None]
            dist_sq = jnp.sum(d * d, axis=0) + soft_sq
            inv = jax.lax.rsqrt(dist_sq)
            w = jnp.where(dist_sq > soft_sq,
                          (base.G * mass) * inv * inv * inv, 0.0)
            return jnp.sum(w * d, axis=1)
        return jax.lax.map(one, tgt.T).T

    exact = np.asarray(exact_at(pos[:, idx], pos, mass), np.float64)
    mag = np.linalg.norm(exact, axis=0)
    rms_mag = float(np.sqrt((mag ** 2).mean()))
    print("exact oracle ready", flush=True)

    # (tag, K, L, budget).  65K CPU scan: the fresh-list error TAIL is
    # budget-overflow + cap-saturation driven (B 0.27M -> 2.5M cut
    # err/rms p99 2.6 -> 0.24), and budget is also the traversal cost
    # driver -- so measure both directions at 1M.
    variants = [
        ("K0_L6144_B0", 0, 6144, 0),
        ("K0_L8192_B8M", 0, 8192, 8_000_000),
        ("K8_L6144_B0", 8, 6144, 0),
        ("K8_L8192_B8M", 8, 8192, 8_000_000),
        ("K8_L2048_B0", 8, 2048, 0),
    ]
    for tag, K, L, B in variants:
        cfg = base.replace(list_capacity=L, near_groups=K,
                           worklist_budget=B)
        kw = _build_kw(cfg)
    kw["pool_tile"] = 0   # these sweeps exercise the dense layout
        try:
            t_b = timeit(lambda: build_lists(pos, vel, mass, acc0, **kw))
            lists = build_lists(pos, vel, mass, acc0, **kw)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: BUILD FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        fn = np.asarray(lists.far_n)
        gsz = cfg.group_size
        pos_s = pos[:, lists.order[:n]]
        vel_s = vel[:, lists.order[:n]]
        mass_s = mass[lists.order[:n]]
        try:
            t_e = timeit(lambda: eval_accel_sorted(
                lists, pos_s, mass_s, jnp.float32(0.02), G=cfg.G,
                softening=cfg.softening, group_size=gsz,
                window_groups=cfg.window_groups, use_pallas=True))
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: EVAL FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            t_e = float("nan")
        rf = jax.jit(lambda ls, ps, vs, ms, ac: refresh_lists(
            ls, ps, vs, ms, ac, 0.02, 24.0))
        t_r = timeit(lambda: rf(lists, pos_s, vel_s, mass_s, acc0))

        acc = eval_accel_sorted(
            lists, pos_s, mass_s, jnp.float32(0.02), G=cfg.G,
            softening=cfg.softening, group_size=gsz,
            window_groups=cfg.window_groups, use_pallas=True)
        inv = np.asarray(lists.inv_order)
        acc_o = np.asarray(acc, np.float64)[:, inv[np.asarray(idx)]]
        aerr = np.linalg.norm(acc_o - exact, axis=0)
        err = aerr / np.maximum(mag, 1e-12)
        errn = aerr / rms_mag
        print(f"{tag}: rebuild {t_b*1e3:.0f} ms | eval {t_e*1e3:.1f} ms"
              f" | refresh {t_r*1e3:.0f} ms | far_n mean={fn.mean():.0f}"
              f" p99={np.percentile(fn, 99):.0f} max={fn.max()}"
              f" at_cap={(fn >= L - 1).sum()}"
              f" | err med={np.median(err):.4f}"
              f" p99={np.percentile(err, 99):.3f}"
              f" | err/rms med={np.median(errn):.4f}"
              f" p99={np.percentile(errn, 99):.3f}"
              f" rms={np.sqrt((errn**2).mean()):.4f}", flush=True)


if __name__ == "__main__":
    main()
