"""A/B occupancy-tight octree level caps at 1M (round 5).

The 1M rebuild pays ~400 ms in the octree build (decide21_v2) because
the two deepest levels carry ~1M static slots each against 37K/169K
occupied cells, and ~519 ms of per-slot attribute gathers read packed
tables sized to those caps.  _measure_tree_caps prices real occupancy
once and caps the levels at 2x headroom; this script measures what that
buys on the real chip:

  1. _measure_tree_caps cost itself (one-off)
  2. octree-build marginal: full caps vs tight caps
  3. full-rebuild marginal (ranges emission): full vs tight
  4. far_n / pool checksums: must be identical while cells fit

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide25.py [n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops import bh_window as bw
from spatialsim_tpu.ops.octree import build_octree
from spatialsim_tpu.ops.morton import morton_encode
from spatialsim_tpu.ops.bounds import compute_bounds


def probe_all(out):
    acc = jnp.float32(0)
    for lf in jax.tree_util.tree_leaves(out):
        acc = acc + jnp.sum(lf.astype(jnp.float32)) * jnp.float32(1e-20)
    return acc


def timeit(fn, reps=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(make_chain, reps=3):
    t1 = timeit(make_chain(1), reps)
    t3 = timeit(make_chain(3), reps)
    return (t3 - t1) / 2, t1


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
    cfg = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window"), n)
    kw = bw._build_kw(cfg)
    gsz = kw["group_size"]
    max_depth = kw["max_depth"]
    npad = ((n + gsz - 1) // gsz) * gsz

    p, v, m = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=1)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    acc = jnp.zeros_like(pos)
    del p, v, m

    t0 = time.perf_counter()
    caps = bw._measure_tree_caps(cfg, pos)
    t_caps = time.perf_counter() - t0
    print(f"platform={jax.devices()[0].platform} n={n} "
          f"tree_caps={list(caps)} measured in {t_caps*1e3:.0f} ms",
          flush=True)

    # --- presorted inputs for the octree-only marginal ---
    @jax.jit
    def presort(pos, vel, mass):
        half = compute_bounds(pos)
        codes = morton_encode(pos, half, max_depth)
        order = jnp.argsort(codes).astype(jnp.int32)
        pad = npad - n
        order_pad = jnp.concatenate(
            [order, jnp.broadcast_to(order[-1], (pad,))])
        s_codes = jnp.concatenate(
            [codes[order], jnp.broadcast_to(codes[order[-1]], (pad,))])
        s_pos = pos[:, order_pad]
        s_mass = jnp.where(jnp.arange(npad) >= n, 0.0, mass[order_pad])
        s_vel = vel[:, order_pad]
        return half, s_codes, s_pos, s_vel, s_mass

    half, s_codes, s_pos, s_vel, s_mass = presort(pos, vel, mass)

    for name, lc in (("full", ()), ("tight", caps)):
        def chain(k, lc=lc):
            @jax.jit
            def run(s_codes, s_pos, s_mass, s_vel, half):
                def body(c, _):
                    tree = build_octree(
                        s_codes, c, s_mass, half, max_depth=max_depth,
                        start_level=2, n=npad, sorted_vel=s_vel,
                        level_caps=lc)
                    return c + probe_all(tree), None
                out, _ = jax.lax.scan(body, s_pos, None, length=k)
                return out
            return lambda: run(s_codes, s_pos, s_mass, s_vel, half)

        try:
            tm, t1 = marginal(chain)
            print(f"  octree[{name}] marginal: {tm*1e3:.0f} ms "
                  f"(t1 {t1*1e3:.0f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  octree[{name}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        jax.clear_caches()

    bkw = dict(theta=kw["theta"], softening=kw["softening"],
               skin=kw["skin"], max_depth=max_depth, group_size=gsz,
               window_groups=kw["window_groups"],
               list_cap=kw["list_cap"], pool_tile=kw["pool_tile"],
               with_ranges=True, near_groups=kw["near_groups"])

    sums = {}
    for name, lc in (("full", ()), ("tight", caps)):
        try:
            lists = bw.build_lists(pos, vel, mass, acc,
                                   emit_mode="ranges", tree_caps=lc,
                                   **bkw)
            sums[name] = (int(jnp.sum(lists.far_n)),
                          float(jnp.sum(jnp.abs(lists.pool[:, 6, :]))))
            print(f"  [{name}] far_n_sum={sums[name][0]} "
                  f"mass_abs={sums[name][1]:.4f}", flush=True)
            del lists
        except Exception as e:  # noqa: BLE001
            print(f"  [{name}] FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        jax.clear_caches()

    for name, lc in (("full", ()), ("tight", caps)):
        def chain(k, lc=lc):
            @jax.jit
            def run(pos, vel, mass, acc):
                def body(c, _):
                    lists = bw.build_lists(c, vel, mass, acc,
                                           emit_mode="ranges",
                                           tree_caps=lc, **bkw)
                    return c + probe_all(lists), None
                out, _ = jax.lax.scan(body, pos, None, length=k)
                return out
            return lambda: run(pos, vel, mass, acc)

        try:
            tm, t1 = marginal(chain)
            print(f"  rebuild[{name}] marginal: {tm*1e3:.0f} ms "
                  f"(t1 {t1*1e3:.0f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  rebuild[{name}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        jax.clear_caches()
    print("done", flush=True)


if __name__ == "__main__":
    main()
