"""Localize the compact-emission slowdown by stage (round 5).

decide23: full rebuild [ranges] 3220 ms vs [compact] 4112 ms at 1M —
yet decide24 prices the compact primitives CHEAPER than the scatters
they replace (sort-compact 2 ms + assemble 34 ms vs 51 ms scatter +
40 ms segment_sum at W=4M).  Something outside the primitives eats
~900 ms.  This script times the two stages separately on identical
inputs:

  1. traversal-only marginal: emit_values=False with emit_compact off/on
  2. finish-only marginal: _finish_pool_ranges vs _finish_pool_compact

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide26.py [n]
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
    ng = npad // gsz
    print(f"platform={jax.devices()[0].platform} n={n} gsz={gsz}",
          flush=True)

    p, v, m = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=1)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    del p, v, m

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
        return (half, s_codes, s_pos, s_vel, s_mass, order,
                order_pad)

    half, s_codes, s_pos, s_vel, s_mass, order, order_pad = presort(
        pos, vel, mass)
    s_acc = jnp.zeros_like(s_pos)

    tree = jax.jit(lambda c, p, m, v, a, h: build_octree(
        c, p, m, h, max_depth=max_depth, start_level=2, n=npad,
        sorted_vel=v, sorted_acc=a))(
        s_codes, s_pos, s_mass, s_vel, s_acc, half)
    n_levels = len(tree.levels)
    budget = kw["worklist_budget"] or bw._auto_budget(npad)
    wl_caps = bw._default_wl_caps(ng, n_levels, budget,
                                  c0=tree.levels[0].code.shape[0])
    gpos = s_pos.reshape(3, ng, gsz)
    bbox_min = jnp.min(gpos, axis=2).T
    bbox_max = jnp.max(gpos, axis=2).T
    near = jnp.zeros((ng, 0), jnp.int32)
    intervals = bw._covered_intervals(near, kw["window_groups"], 0, gsz)

    tkw = dict(theta=float(kw["theta"]),
               soft_sq=float(kw["softening"]) ** 2,
               skin=float(kw["skin"]), gsz=gsz, intervals=intervals,
               list_cap=kw["list_cap"], n_levels=n_levels,
               wl_caps=wl_caps, quadrupole=False, with_acc=True,
               with_ranges=True, emit_values=False)

    # --- 1. traversal-only ---
    for name, ec in (("ranges", False), ("compact", True),
                     ("compact-mm", "mm")):
        def chain(k, ec=ec):
            @jax.jit
            def run(tree, bbox_min, bbox_max, intervals):
                def body(bb, _):
                    out = bw._traverse_global(
                        tree, bb, bbox_max, ng,
                        **{**tkw, "intervals": intervals},
                        emit_compact=ec)
                    return bb + probe_all(out), None
                out, _ = jax.lax.scan(body, bbox_min, None, length=k)
                return out
            return lambda: run(tree, bbox_min, bbox_max, intervals)

        try:
            tm, t1 = marginal(chain)
            print(f"  traverse[{name}] marginal: {tm*1e3:.0f} ms "
                  f"(t1 {t1*1e3:.0f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  traverse[{name}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        jax.clear_caches()

    # --- 2. finish-only, on real traversal outputs ---
    out_r = jax.jit(lambda t, bb: bw._traverse_global(
        t, bb, bbox_max, ng, **tkw, emit_compact=False))(tree, bbox_min)
    out_c = jax.jit(lambda t, bb: bw._traverse_global(
        t, bb, bbox_max, ng, **tkw, emit_compact=True))(tree, bbox_min)
    cap = bw.pool_cap_tiles(budget, ng, kw["pool_tile"] or 512, npad)

    def chain_fin_ranges(k):
        _f, fr, fn, sls, sle, sln, res, _wl = out_r

        @jax.jit
        def run(fr, fn, sls, sle, sln, res, s_pos, s_vel, s_mass,
                order, order_pad, pos, s_acc):
            def body(c, _):
                lists = bw._finish_pool_ranges(
                    fr, fn, sls, sle, sln, res, c, s_vel, s_mass,
                    order, order_pad, pos, n, kw["list_cap"],
                    tile=kw["pool_tile"] or 512, cap_tiles=cap,
                    s_acc=s_acc, near=near)
                return c + probe_all(lists), None
            out, _ = jax.lax.scan(body, s_pos, None, length=k)
            return out
        return lambda: run(fr, fn, sls, sle, sln, res, s_pos, s_vel,
                           s_mass, order, order_pad, pos, s_acc)

    def chain_fin_compact(k):
        _f, emits, fn, sls, sle, sln, res, _wl = out_c

        @jax.jit
        def run(emits, fn, sls, sle, sln, res, s_pos, s_vel, s_mass,
                order, order_pad, pos, s_acc):
            def body(c, _):
                lists = bw._finish_pool_compact(
                    emits, fn, sls, sle, sln, res, c, s_vel, s_mass,
                    order, order_pad, pos, n, kw["list_cap"],
                    tile=kw["pool_tile"] or 512, cap_tiles=cap,
                    emit_offsets=bw._emit_offsets(wl_caps),
                    s_acc=s_acc, near=near)
                return c + probe_all(lists), None
            out, _ = jax.lax.scan(body, s_pos, None, length=k)
            return out
        return lambda: run(emits, fn, sls, sle, sln, res, s_pos, s_vel,
                           s_mass, order, order_pad, pos, s_acc)

    for name, mk in (("finish[ranges]", chain_fin_ranges),
                     ("finish[compact]", chain_fin_compact)):
        try:
            tm, t1 = marginal(mk)
            print(f"  {name} marginal: {tm*1e3:.0f} ms (t1 {t1*1e3:.0f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        jax.clear_caches()
    print("done", flush=True)


if __name__ == "__main__":
    main()
