"""Root-cause the 10M force-error tail (round-4 queue E).

The 10M Plummer runs (docs/measurements_r4/x10m_pool_diag.log,
quad_scan_10m_v2.log) show rms relative force error 0.41-0.86 at
theta=0.8 with ~306 groups saturating the far-list cap (L=8192) and
summed residual mass ~1.5x total — while theta=1.2 measures BETTER
(rms 0.14), inverting approximation theory.  Hypothesis: samples in
at-cap groups see their overflow far field lumped into one residual
monopole; the error is cap saturation, not the multipole expansion.

For each variant this prints error quantiles overall AND split by
(a) sample's group at the far-list cap, (b) sample's group residual
mass decile, (c) |F| magnitude decile (relative-metric artifact
check), plus an absolute error normalized by the median |F|.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide20.py [n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import (
    build_lists, eval_accel, _build_kw, _pool_ranges, POOL_ROWS)


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    base = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.08, softening=3.0, damping=1.0,
        spawn_radius=700.0, distribution="cluster", engine="window",
        rebuild_drift_mode="off"), n)

    p, v, m = distributions.generate_distribution(
        "cluster", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    del p, v, m

    rng = np.random.default_rng(1)
    idx_np = np.sort(rng.choice(n, 2048, replace=False))
    idx = jnp.asarray(idx_np)
    tgt = pos[:, idx]

    @jax.jit
    def exact_at(tgt, pos, mass):
        soft_sq = base.softening ** 2

        def one(t):
            d = pos - t[:, None]
            dist_sq = jnp.sum(d * d, axis=0) + soft_sq
            inv = jax.lax.rsqrt(dist_sq)
            w = jnp.where(dist_sq > soft_sq,
                          (base.G * mass) * inv * inv * inv, 0.0)
            return jnp.sum(w * d, axis=1)
        return jax.lax.map(one, tgt.T).T

    t0 = time.perf_counter()
    e = np.asarray(exact_at(tgt, pos, mass), np.float64)
    mag = np.linalg.norm(e, axis=0)
    print(f"oracle: {time.perf_counter() - t0:.0f} s | "
          f"|F| median={np.median(mag):.4g} p10={np.percentile(mag, 10):.4g}",
          flush=True)

    from spatialsim_tpu.ops.bh_window import calibrate_config
    t0 = time.perf_counter()
    cal = calibrate_config(base, pos, vel, mass)
    print(f"calibrate: {time.perf_counter() - t0:.0f} s "
          f"wl_caps={list(cal.wl_caps) or 'default'}", flush=True)
    variants = [
        ("prod_uncal", None),
        ("calibrated", {}),
        ("cal_L16k", {"list_capacity": 16384}),
    ]
    for tag, over in variants:
      try:
        cfg = base if over is None else cal.replace(**over)
        kw = _build_kw(cfg)
        t0 = time.perf_counter()
        lists = build_lists(pos, vel, mass, **kw)
        jax.block_until_ready(lists.far_n)
        t_build = time.perf_counter() - t0

        fn = np.asarray(lists.far_n)
        L = cfg.list_capacity
        at_cap = fn >= L - 1
        # Per-group residual mass: pooled entries with fs == fe are
        # rangeless (the residual slot); sum their mass per group.
        if lists.pool is not None:
            fs, fe = _pool_ranges(lists.pool)
            pm = lists.pool.transpose(1, 0, 2).reshape(
                POOL_ROWS, -1)[6]
            tile = lists.pool.shape[2]
            ct = lists.pool.shape[0]
            t_idx = jnp.arange(ct * tile, dtype=jnp.int32) // tile
            g_of = (jnp.searchsorted(lists.pstart,
                                     jnp.arange(ct, dtype=jnp.int32),
                                     side="right") - 1)
            g_flat = jnp.clip(g_of[t_idx], 0, fn.shape[0] - 1)
            resm = jnp.where((fs == fe) & (pm > 0), pm, 0.0)
            res_g = np.asarray(jax.ops.segment_sum(
                resm, g_flat, num_segments=fn.shape[0]))
        else:
            res_g = np.zeros(fn.shape[0])

        t0 = time.perf_counter()
        acc = eval_accel(lists, pos, mass, jnp.float32(0.0), G=cfg.G,
                         softening=cfg.softening,
                         group_size=cfg.group_size,
                         window_groups=cfg.window_groups,
                         quadrupole=cfg.use_quadrupole)
        a = np.asarray(acc[:, idx], np.float64)
        t_eval = time.perf_counter() - t0
        del acc

        err = np.linalg.norm(a - e, axis=0) / np.maximum(mag, 1e-12)
        aerr = np.linalg.norm(a - e, axis=0) / np.median(mag)
        inv_order = np.asarray(lists.inv_order)
        g_smp = inv_order[idx_np] // cfg.group_size
        smp_cap = at_cap[g_smp]
        smp_res = res_g[g_smp]
        mtot = float(np.asarray(mass).sum())

        def q(x):
            if x.size == 0:
                return "n=0"
            return (f"n={x.size} med={np.median(x):.4f} "
                    f"p99={np.percentile(x, 99):.4f} "
                    f"rms={np.sqrt((x ** 2).mean()):.4f}")

        print(f"[{tag}] build={t_build:.0f}s eval={t_eval:.1f}s "
              f"far_n mean={fn.mean():.0f} p99={np.percentile(fn, 99):.0f} "
              f"at_cap={int(at_cap.sum())}/{fn.shape[0]} "
              f"res_mass_frac={res_g.sum() / mtot:.3f}", flush=True)
        print(f"  all      rel {q(err)} | abs-norm rms="
              f"{np.sqrt((aerr ** 2).mean()):.4f}", flush=True)
        print(f"  at-cap   rel {q(err[smp_cap])}", flush=True)
        print(f"  not-cap  rel {q(err[~smp_cap])}", flush=True)
        hi_res = smp_res > np.percentile(res_g[res_g > 0], 90) \
            if (res_g > 0).any() else np.zeros_like(smp_cap)
        print(f"  hi-res   rel {q(err[hi_res])}", flush=True)
        print(f"  zero-res rel {q(err[smp_res == 0])}", flush=True)
        lowF = mag < np.percentile(mag, 10)
        print(f"  lowF     rel {q(err[lowF])} | "
              f"highF rel {q(err[~lowF])}", flush=True)
        del lists, a
      except Exception as ex:  # noqa: BLE001 — one variant's OOM must not kill the rest
        print(f"[{tag}] FAILED {type(ex).__name__}: {str(ex)[:300]}",
              flush=True)
        # Actually release the failed variant's HBM before the next one:
        # partially-built device arrays and jit caches otherwise stay
        # referenced in locals and cascade the ResourceExhausted
        # (decide20_v2.log: calibrated AND cal_L16k failed back-to-back).
        lists = a = fn = at_cap = res_g = None  # noqa: F841
        import gc
        gc.collect()
        jax.clear_caches()
    print("done", flush=True)


if __name__ == "__main__":
    main()
