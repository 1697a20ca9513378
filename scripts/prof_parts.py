"""Decompose the rebuild: sort / octree / full build / eval at scale.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/prof_parts.py [n]
One process per run (single-chip rule).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bounds import compute_bounds
from spatialsim_tpu.ops.morton import morton_encode
from spatialsim_tpu.ops.octree import build_octree
from spatialsim_tpu.ops.bh_window import (
    build_lists, eval_accel_sorted, _build_kw)


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
    cfg = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window",
        skin=2.0, rebuild_interval=48, rebuild_drift_mode="off"), n)
    print(f"n={n:,} depth={cfg.max_depth} gsz={cfg.group_size} "
          f"L={cfg.list_capacity} platform={jax.devices()[0].platform}",
          flush=True)
    p, v, m = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    gsz = cfg.group_size
    npad = ((n + gsz - 1) // gsz) * gsz
    pad = npad - n
    depth = cfg.max_depth

    @jax.jit
    def sort_part(pos):
        half = compute_bounds(pos)
        codes = morton_encode(pos, half, depth)
        order = jnp.argsort(codes).astype(jnp.int32)
        return codes, order, half

    @jax.jit
    def gather_part(pos, vel, mass, codes, order):
        order_pad = jnp.concatenate(
            [order, jnp.broadcast_to(order[-1], (pad,))])
        s_codes = jnp.concatenate(
            [codes[order], jnp.broadcast_to(codes[order[-1]], (pad,))])
        S = jnp.concatenate([pos, vel, mass[None]], axis=0)[:, order_pad]
        return s_codes, S

    @jax.jit
    def octree_part(s_codes, S, half):
        pad_mask = jnp.arange(npad) >= n
        s_mass = jnp.where(pad_mask, 0.0, S[6])
        return build_octree(s_codes, S[0:3], s_mass, half,
                            max_depth=depth, start_level=2, n=npad,
                            sorted_vel=S[3:6])

    t_sort = timeit(sort_part, pos)
    codes, order, half = sort_part(pos)
    t_gather = timeit(gather_part, pos, vel, mass, codes, order)
    s_codes, S = gather_part(pos, vel, mass, codes, order)
    t_oct = timeit(octree_part, s_codes, S, half)

    kw = _build_kw(cfg)
    acc0 = jnp.zeros_like(pos)
    t_build = timeit(lambda: build_lists(pos, vel, mass, acc0, **kw))
    lists = build_lists(pos, vel, mass, acc0, **kw)

    pos_s = pos[:, lists.order[:n]]
    mass_s = mass[lists.order[:n]]
    ekw = dict(G=cfg.G, softening=cfg.softening, group_size=gsz,
               window_groups=cfg.window_groups, use_pallas=True)
    t_eval = timeit(lambda: eval_accel_sorted(
        lists, pos_s, mass_s, jnp.float32(0.02), **ekw))

    print(f"sort+morton: {t_sort*1e3:8.1f} ms")
    print(f"state gather:{t_gather*1e3:8.1f} ms")
    print(f"octree:      {t_oct*1e3:8.1f} ms")
    print(f"build_lists: {t_build*1e3:8.1f} ms  (incl. all above)")
    print(f"traversal~=  {(t_build - t_sort - t_gather - t_oct)*1e3:8.1f} ms")
    print(f"eval:        {t_eval*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
