"""Scan window-engine configs against one shared direct-sum oracle.

Usage: PYTHONPATH=/root/repo python scripts/nbody_error_scan.py [n]

Also reports the exact per-step Barnes-Hut engine's error on the same
sample — the floor set by theta itself; window configs should sit near it.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import window_bh_accel


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


def report(tag, acc_idx, exact, t_build=None):
    a = np.asarray(acc_idx, np.float64)
    e = np.asarray(exact, np.float64)
    mag = np.linalg.norm(e, axis=0)
    err = np.linalg.norm(a - e, axis=0) / np.maximum(mag, 1e-12)
    out = {"cfg": tag,
           "median": round(float(np.median(err)), 5),
           "p99": round(float(np.percentile(err, 99)), 5),
           "rms": round(float(np.sqrt((err ** 2).mean())), 5)}
    if t_build is not None:
        out["build_ms"] = round(t_build * 1000)
    print(json.dumps(out), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    base = NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, spawn_radius=500.0,
        distribution="galaxy", engine="window", max_depth=9, group_size=256,
        window_groups=3, list_capacity=6144, skin=6.0)

    pp, vv, mm = distributions.generate_distribution(
        "galaxy", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(pp.T, jnp.float32)
    vel = jnp.asarray(vv.T, jnp.float32)
    mass = jnp.asarray(mm, jnp.float32)

    rng = np.random.default_rng(1)
    idx = jnp.asarray(np.sort(rng.choice(n, 2048, replace=False)))
    exact = np.asarray(exact_accel_at(pos[:, idx], pos, mass, base.G,
                                      base.softening ** 2))
    print("oracle ready", flush=True)

    # Exact-traversal BH engine = the theta floor.
    from spatialsim_tpu.ops.barnes_hut import barnes_hut_accel
    ecfg = base.replace(max_depth=9)
    try:
        acc = barnes_hut_accel(pos, mass, ecfg)
        report("exact_bh_depth9", acc[:, idx], exact)
    except Exception as exc:
        print(f"exact BH failed: {exc}", flush=True)

    variants = [
        ("win_d9_base", {}),
        ("win_d8", {"max_depth": 8}),
        ("win_d9_budget3M", {"worklist_budget": 3_000_000}),
        ("win_d8_budget3M", {"max_depth": 8,
                             "worklist_budget": 3_000_000}),
        ("win_d9_gsz512", {"group_size": 512, "list_capacity": 8192}),
        ("win_d9_L4096", {"list_capacity": 4096}),
    ]
    for tag, over in variants:
        cfg = base.replace(**over)
        t0 = time.perf_counter()
        acc = window_bh_accel(pos, vel, mass, cfg)
        np.asarray(acc[0, :1])
        t1 = time.perf_counter()
        acc2 = window_bh_accel(pos, vel, mass, cfg)
        np.asarray(acc2[0, :1])
        t_build = time.perf_counter() - t1
        report(tag, acc[:, idx], exact, t_build)


if __name__ == "__main__":
    main()
