"""A/B the scatter-free compact emission against ranges emission (round 5).

The round-5 phase ablation (decide21_1m_v2) showed the 1M rebuild
traversal spends +562 ms in the emission scatters and +519 ms in the
per-slot attribute gathers.  The compact path (bh_window._tile_compact /
_tile_assemble / _finish_pool_compact) removes every W-domain scatter:
within-tile stable compaction (variadic sort network or one-hot MXU
matmul) + run-reconstruction assembly + a finish that decodes pool slots
with per-TILE table gathers.  CPU equality is bit-exact (tests); this
script prices it on the real chip:

  1. full-rebuild chained marginal: ranges | compact | compact-mm
  2. traversal-only marginal for the same three
  3. finish_pool_compact marginal on real traversal outputs
  4. far_n / pool checksum equality across modes ON CHIP

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide23.py [n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops import bh_window as bw


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
    print(f"platform={jax.devices()[0].platform} n={n} "
          f"depth={kw['max_depth']} gsz={kw['group_size']} "
          f"wg={kw['window_groups']} L={kw['list_cap']} "
          f"pool={kw['pool_tile']}", flush=True)

    p, v, m = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=1)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    acc = jnp.zeros_like(pos)
    del p, v, m

    bkw = dict(theta=kw["theta"], softening=kw["softening"],
               skin=kw["skin"], max_depth=kw["max_depth"],
               group_size=kw["group_size"],
               window_groups=kw["window_groups"],
               list_cap=kw["list_cap"], pool_tile=kw["pool_tile"],
               with_ranges=True, near_groups=kw["near_groups"])

    # --- 4. equality across modes, on chip ---
    sums = {}
    for mode in ("ranges", "compact", "compact-mm"):
        try:
            lists = bw.build_lists(pos, vel, mass, acc,
                                   emit_mode=mode, **bkw)
            sums[mode] = (
                int(jnp.sum(lists.far_n)),
                float(jnp.sum(jnp.abs(lists.pool[:, 6, :]))),
                float(jnp.sum(lists.pool.astype(jnp.float64)
                              if lists.pool.dtype != jnp.float32
                              else lists.pool * 1e-6)))
            print(f"  [{mode}] far_n_sum={sums[mode][0]} "
                  f"mass_abs={sums[mode][1]:.4f} "
                  f"pool_sum={sums[mode][2]:.4f}", flush=True)
            del lists
        except Exception as e:  # noqa: BLE001
            print(f"  [{mode}] FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        jax.clear_caches()

    # --- 1. full-rebuild chained marginals ---
    for mode in ("ranges", "compact", "compact-mm"):
        def chain(k, mode=mode):
            @jax.jit
            def run(pos, vel, mass, acc):
                def body(c, _):
                    lists = bw.build_lists(c, vel, mass, acc,
                                           emit_mode=mode, **bkw)
                    return c + probe_all(lists), None
                out, _ = jax.lax.scan(body, pos, None, length=k)
                return out
            return lambda: run(pos, vel, mass, acc)

        try:
            tm, t1 = marginal(chain)
            print(f"  rebuild[{mode}] marginal: {tm*1e3:.0f} ms "
                  f"(t1 {t1*1e3:.0f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  rebuild[{mode}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        jax.clear_caches()
    print("done", flush=True)


if __name__ == "__main__":
    main()
