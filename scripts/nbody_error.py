"""Window-engine force error vs a direct-sum oracle at scale.

Usage: PYTHONPATH=/root/repo python scripts/nbody_error.py [n] [flags]

Samples bodies, computes their EXACT accelerations by direct summation
over all N bodies on-chip, and reports the window engine's relative force
error (median / p99 / rms).  This is the gate for depth / worklist-budget
/ list-capacity tuning: faster configs must keep errors at the theta
level (~1e-3 relative for theta=0.8).
"""

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import window_bh_accel


@jax.jit
def exact_accel_at(targets, pos, mass, G, soft_sq):
    """Direct-sum accelerations at `targets` (3, M) from all bodies."""
    def one_chunk(tgt):
        d = pos[:, None, :] - tgt[:, :, None]          # (3, C, N)
        dist_sq = jnp.sum(d * d, axis=0) + soft_sq
        inv = jax.lax.rsqrt(dist_sq)
        w = jnp.where(dist_sq > soft_sq,
                      (G * mass)[None, :] * inv * inv * inv, 0.0)
        return jnp.sum(w[None] * d, axis=2)            # (3, C)
    m = targets.shape[1]
    c = 256
    parts = targets.reshape(3, m // c, c).transpose(1, 0, 2)
    return jax.lax.map(one_chunk, parts).transpose(1, 0, 2).reshape(3, m)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("n", type=int, nargs="?", default=1_000_000)
    p.add_argument("--theta", type=float, default=0.8)
    p.add_argument("--depth", type=int, default=9)
    p.add_argument("--group-size", type=int, default=256)
    p.add_argument("--list-cap", type=int, default=6144)
    p.add_argument("--budget", type=int, default=0)
    p.add_argument("--wg", type=int, default=3)
    p.add_argument("--skin", type=float, default=6.0)
    p.add_argument("--distribution", default="galaxy")
    p.add_argument("--sample", type=int, default=2048)
    p.add_argument("--quad", action="store_true")
    p.add_argument("--scale", type=float, default=1.0,
                   help="quad_accept_scale (with --quad)")
    args = p.parse_args()

    n = args.n
    cfg = NBodyConfig(
        num_bodies=n, theta=args.theta, G=0.1, softening=2.0,
        spawn_radius=500.0, distribution=args.distribution, engine="window",
        max_depth=args.depth, group_size=args.group_size,
        window_groups=args.wg, list_capacity=args.list_cap, skin=args.skin,
        worklist_budget=args.budget, use_quadrupole=args.quad,
        quad_accept_scale=args.scale)

    pp, vv, mm = distributions.generate_distribution(
        args.distribution, n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(pp.T, jnp.float32)
    vel = jnp.asarray(vv.T, jnp.float32)
    mass = jnp.asarray(mm, jnp.float32)

    acc = window_bh_accel(pos, vel, mass, cfg)
    acc.block_until_ready()

    rng = np.random.default_rng(1)
    idx = jnp.asarray(np.sort(rng.choice(n, args.sample, replace=False)))
    tgt = pos[:, idx]
    exact = exact_accel_at(tgt, pos, mass, cfg.G, cfg.softening ** 2)
    a = np.asarray(acc[:, idx], np.float64)
    e = np.asarray(exact, np.float64)
    mag = np.linalg.norm(e, axis=0)
    err = np.linalg.norm(a - e, axis=0) / np.maximum(mag, 1e-12)
    # Per-body relative error explodes where the NET force nearly cancels
    # (cluster centres); the rms-normalized variant divides by the rms
    # force magnitude instead (the tests' convention).
    err_n = np.linalg.norm(a - e, axis=0) / np.sqrt((mag ** 2).mean())
    print(json.dumps({
        "n": n, "depth": args.depth, "budget": args.budget,
        "list_cap": args.list_cap, "gsz": args.group_size,
        "theta": args.theta,
        "err_median": float(np.median(err)),
        "err_p99": float(np.percentile(err, 99)),
        "err_rms": float(np.sqrt((err ** 2).mean())),
        "relrms_median": float(np.median(err_n)),
        "relrms_p99": float(np.percentile(err_n, 99)),
        "relrms_rms": float(np.sqrt((err_n ** 2).mean())),
    }), flush=True)


if __name__ == "__main__":
    main()
