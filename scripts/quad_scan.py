"""Quadrupole-vs-monopole frontier at production scale.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/quad_scan.py [n]

For each engine config: force error vs one shared direct-sum oracle
(median / p99 / rms), rebuild time, fused-eval time, and list/worklist
occupancy.  This is the measurement that sets use_quadrupole /
quad_accept_scale / list_capacity defaults in config/nbody.py.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import (
    build_lists, build_diagnostics, eval_accel, _build_kw)


@jax.jit
def exact_accel_at(targets, pos, mass, G, soft_sq):
    def one_chunk(tgt):
        d = pos[:, None, :] - tgt[:, :, None]
        dist_sq = jnp.sum(d * d, axis=0) + soft_sq
        inv = jax.lax.rsqrt(dist_sq)
        w = jnp.where(dist_sq > soft_sq,
                      (G * mass)[None, :] * inv * inv * inv, 0.0)
        return jnp.sum(w[None] * d, axis=2)
    m = targets.shape[1]
    c = 256
    parts = targets.reshape(3, m // c, c).transpose(1, 0, 2)
    return jax.lax.map(one_chunk, parts).transpose(1, 0, 2).reshape(3, m)


def timeit(fn, reps=2):
    out = fn()
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1] if leaf.ndim else leaf)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1] if leaf.ndim else leaf)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    if n > 4_000_000:
        # Production-accuracy measurement at EXTREME scale (the driver's
        # 10M config is the Plummer cluster): the resolved engine shape
        # (pooled ranges, depth 9, gsz 1024) — the 1M quadrupole
        # frontier's dense/values variants exhaust HBM here (round-4
        # quad_scan_10m: compile asked 29.8 GB).
        from spatialsim_tpu.config.nbody import resolve_config
        base = resolve_config(NBodyConfig(
            num_bodies=n, theta=0.8, G=0.1, softening=2.0,
            spawn_radius=500.0, distribution="cluster",
            engine="window"), n)
        # prod = the exact bench path incl. demand calibration (the
        # round-5 error-tail fix); theta 1.3 is the reference's own 10M
        # preset acceptance (tools/presets.py:2410).
        variants = [("prod", {}),
                    ("prod_theta1.3", {"theta": 1.3})]
    else:
        base = NBodyConfig(
            num_bodies=n, theta=0.8, G=0.1, softening=2.0,
            spawn_radius=500.0, distribution="galaxy", engine="window",
            max_depth=8, group_size=256, window_groups=2,
            list_capacity=6144, skin=6.0, use_quadrupole=False)
        variants = None

    pp, vv, mm = distributions.generate_distribution(
        base.distribution, n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(pp.T, jnp.float32)
    vel = jnp.asarray(vv.T, jnp.float32)
    mass = jnp.asarray(mm, jnp.float32)

    if n > 4_000_000:
        from spatialsim_tpu.ops.bh_window import calibrate_config
        t0 = time.time()
        base = calibrate_config(base, pos, vel, mass)
        print(f"calibrated in {time.time()-t0:.0f}s "
              f"wl_caps={list(getattr(base, 'wl_caps', ()) or ())} "
              f"pool_cap={getattr(base, 'pool_cap', 0)}", flush=True)

    rng = np.random.default_rng(1)
    idx = jnp.asarray(np.sort(rng.choice(n, 2048, replace=False)))
    exact = np.asarray(exact_accel_at(pos[:, idx], pos, mass, base.G,
                                      base.softening ** 2))
    print("oracle ready", flush=True)

    if variants is None:
        variants = [
            ("mono_d7", {"max_depth": 7}),
            ("quad_d7_s1.0", {"max_depth": 7, "use_quadrupole": True,
                              "quad_accept_scale": 1.0}),
            ("quad_d7_s1.0_L3k", {"max_depth": 7, "use_quadrupole": True,
                                  "quad_accept_scale": 1.0,
                                  "list_capacity": 3072}),
            ("quad_d7_s1.2_L3k", {"max_depth": 7, "use_quadrupole": True,
                                  "quad_accept_scale": 1.2,
                                  "list_capacity": 3072}),
            ("mono_d6", {"max_depth": 6}),
            ("quad_d6_s1.0", {"max_depth": 6, "use_quadrupole": True,
                              "quad_accept_scale": 1.0}),
        ]
    for tag, over in variants:
        cfg = base.replace(**over)
        kw = _build_kw(cfg)
        t_build, lists = timeit(
            lambda: build_lists(pos, vel, mass, **kw))
        t_eval, acc = timeit(
            lambda: eval_accel(lists, pos, mass, jnp.float32(0.02),
                               G=cfg.G, softening=cfg.softening,
                               group_size=cfg.group_size,
                               window_groups=cfg.window_groups,
                               use_pallas=True,
                               quadrupole=cfg.use_quadrupole,
                               tau_clamp=float(cfg.advance_tau_clamp)))
        a = np.asarray(acc[:, idx], np.float64)
        e = np.asarray(exact, np.float64)
        mag = np.linalg.norm(e, axis=0)
        err = np.linalg.norm(a - e, axis=0) / np.maximum(mag, 1e-12)
        diag = build_diagnostics(pos, vel, mass, cfg)
        wl = np.array(diag["wl_sizes"][:diag["n_levels"]], float)
        print(json.dumps({
            "cfg": tag,
            "median": round(float(np.median(err)), 5),
            "p99": round(float(np.percentile(err, 99)), 5),
            "rms": round(float(np.sqrt((err ** 2).mean())), 5),
            "build_ms": round(t_build * 1000),
            "eval_ms": round(t_eval * 1000, 1),
            "far_n_mean": round(diag["far_n_mean"]),
            "far_n_p99": round(diag["far_n_p99"]),
            "groups_at_cap": diag["groups_at_cap"],
            "wl_visited_M": round(float(wl.sum()) / 1e6, 2),
            "residual_frac": round(diag["residual_mass_frac"], 5),
        }), flush=True)


if __name__ == "__main__":
    main()
