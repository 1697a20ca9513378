"""1M rebuild A/B (round 5): cellid finish + demand-fit worklist caps.

Production-context phase costs via FULL build_lists chained marginals
in ONE process (the isolated-stage timings of decide26 contradict the
full-rebuild A/B of decide23, so stage costs are derived here only by
ablation INSIDE the production program):

  a. ranges, tight tree caps          — the production baseline
  b. a + ablate=("finish",)           — difference = finish cost
  c. cellid                           — one id column emitted; finish
                                        gathers moments straight from
                                        the cell tables (1 packed
                                        gather/slot vs 3 + comp math)
  d. ranges + demand-FIT wl caps      — caps shrunk to measured demand
                                        x1.30 (traversal+finish cost is
                                        cap-proportional)
  e. cellid + fit caps                — the candidate new default

Also checks far_n/range-row/mass checksums ranges vs cellid on chip.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide27.py [n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops import bh_window as bw
from spatialsim_tpu.ops.octree import level_capacity


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
    ng = npad // gsz
    n_levels = max_depth - 2 + 1

    p, v, m = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=1)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    acc = jnp.zeros_like(pos)
    del p, v, m

    tree_caps = bw._measure_tree_caps(cfg, pos)
    cfg = cfg.replace(tree_caps=tree_caps)
    print(f"platform={jax.devices()[0].platform} n={n} "
          f"tree_caps={list(tree_caps)}", flush=True)

    budget = kw["worklist_budget"] or bw._auto_budget(npad)
    c0 = level_capacity(2, npad)
    defaults = bw._default_wl_caps(ng, n_levels, budget, c0=c0)

    bkw = dict(theta=kw["theta"], softening=kw["softening"],
               skin=kw["skin"], max_depth=max_depth, group_size=gsz,
               window_groups=kw["window_groups"],
               list_cap=kw["list_cap"], pool_tile=kw["pool_tile"],
               with_ranges=True, near_groups=kw["near_groups"],
               tree_caps=tree_caps)

    # Demand probe for the fit caps (same probe calibrate_config runs).
    wl = bw._traverse_probe(cfg, pos, vel, mass, defaults)
    demand = wl[n_levels:]
    fit = []
    for li in range(n_levels):
        floor = ng * (c0 if li == 0 else 8)
        tgt = int(max(demand[li] * 1.30, floor))
        tgt = -(-tgt // 1024) * 1024
        fit.append(int(min(tgt, defaults[li])))
    fit = tuple(fit)
    print(f"  demand={list(int(d) for d in demand)}", flush=True)
    print(f"  defaults={list(defaults)} sum={sum(defaults)}", flush=True)
    print(f"  fit caps={list(fit)} sum={sum(fit)}", flush=True)

    # On-chip equality: ranges vs cellid (fit caps).
    sums = {}
    for mode in ("ranges", "cellid"):
        ls = bw.build_lists(pos, vel, mass, acc, emit_mode=mode,
                            wl_caps=fit, **bkw)
        sums[mode] = (int(jnp.sum(ls.far_n)),
                      float(jnp.sum(jnp.abs(ls.pool[:, 6, :]))),
                      int(jnp.sum(ls.pool[:, 10:14, :].astype(jnp.int64))))
        print(f"  [{mode}] far_n_sum={sums[mode][0]} "
              f"mass_abs={sums[mode][1]:.4f} rng_sum={sums[mode][2]}",
              flush=True)
        del ls
        jax.clear_caches()

    variants = [
        ("a.ranges", dict(emit_mode="ranges", wl_caps=defaults)),
        ("b.ranges-nofinish", dict(emit_mode="ranges", wl_caps=defaults,
                                   ablate=("finish",))),
        ("c.cellid", dict(emit_mode="cellid", wl_caps=defaults)),
        ("d.ranges-fit", dict(emit_mode="ranges", wl_caps=fit)),
        ("e.cellid-fit", dict(emit_mode="cellid", wl_caps=fit)),
        ("f.cellid-fit-nofinish", dict(emit_mode="cellid", wl_caps=fit,
                                       ablate=("finish",))),
    ]
    for name, extra in variants:
        def chain(k, extra=extra):
            @jax.jit
            def run(pos, vel, mass, acc):
                def body(c, _):
                    lists = bw.build_lists(c, vel, mass, acc,
                                           **extra, **bkw)
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
