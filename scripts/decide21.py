"""Decompose the rebuild traversal cost by phase ablation (round 4).

The XLA traversal costs ~410 ns/worklist-slot at 1M (decide11/17:
ranges build 1879 ms of which traversal ~1.5 s), but the accountable
memory ops (4 packed gathers ~60-75 ns + 2 ranges-scatter columns
~12 ns + child-run reconstruction) only explain ~150 ns.  This script
times `_traverse_global` with each phase replaced by a cost-free
stand-in at IDENTICAL static capacities (see the `ablate` kwarg),
chained-marginal per tpu-platform rules, so

    t(baseline) - t(ablate=X)  ==  the cost of phase X.

Also times the non-traversal rebuild parts on the same inputs:
octree build, argsort+gathers, dense finish (`_finish_lists` ranges
path) and pool finish (`_finish_pool_ranges`) — decide17 measured
ranges+pool 3.2 s vs ranges 1.9 s at its config, implicating the pool
compaction as a second wall.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide21.py [n]
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
    """f32 scalar that depends on EVERY leaf of ``out``.

    Probing a single element of a single output lets XLA dead-code-
    eliminate the rest of the scan body (measured: octree marginal
    "-1 ms", traversal 462 ms vs 2808 ms single-dispatch — the emission
    scatters were pruned).  Full reductions cannot be sliced through, so
    every producing op stays live; the extra HBM read (~one pass over
    the outputs) is noise against the phases being measured.
    """
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
    """min over reps of (t3 - t1)/2 for a chain factory."""
    c1 = make_chain(1)
    c3 = make_chain(3)
    t1 = timeit(c1, reps)
    t3 = timeit(c3, reps)
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
          f"pool={kw['pool_tile']} emit={kw['emit_mode']}", flush=True)

    p, v, m = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=1)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    acc = jnp.zeros_like(pos)
    del p, v, m

    gsz = kw["group_size"]
    max_depth = kw["max_depth"]
    npad = ((n + gsz - 1) // gsz) * gsz
    ng = npad // gsz

    # --- sorted state + octree (once; the ablation A/B shares them) ---
    @jax.jit
    def presort(pos, vel, mass, acc):
        half = compute_bounds(pos)
        codes = morton_encode(pos, half, max_depth)
        order = jnp.argsort(codes).astype(jnp.int32)
        pad = npad - n
        order_pad = jnp.concatenate(
            [order, jnp.broadcast_to(order[-1], (pad,))])
        s_codes = jnp.concatenate(
            [codes[order], jnp.broadcast_to(codes[order[-1]], (pad,))])
        s_pos = pos[:, order_pad]
        pad_mask = jnp.arange(npad) >= n
        s_mass = jnp.where(pad_mask, 0.0, mass[order_pad])
        s_vel = vel[:, order_pad]
        s_acc = acc[:, order_pad]
        return half, s_codes, s_pos, s_vel, s_mass, s_acc, order, order_pad

    half, s_codes, s_pos, s_vel, s_mass, s_acc, order, order_pad = \
        presort(pos, vel, mass, acc)

    t_sort, _ = marginal(lambda k: (lambda: _chain_sort(
        pos, vel, mass, acc, k, presort)))
    print(f"  sort+gathers marginal: {t_sort*1e3:.0f} ms", flush=True)

    def mktree(s_codes, s_pos, s_mass, s_vel, s_acc, half):
        return build_octree(s_codes, s_pos, s_mass, half,
                            max_depth=max_depth, start_level=2, n=npad,
                            sorted_vel=s_vel, sorted_acc=s_acc,
                            with_quadrupole=False)

    def chain_tree(k):
        @jax.jit
        def run(s_codes, s_pos, s_mass, s_vel, s_acc, half):
            def body(c, _):
                tree = mktree(s_codes, c, s_mass, s_vel, s_acc, half)
                return c + probe_all(tree), None
            out, _ = jax.lax.scan(body, s_pos, None, length=k)
            return out
        return lambda: run(s_codes, s_pos, s_mass, s_vel, s_acc, half)

    t_tree, _ = marginal(chain_tree)
    print(f"  octree marginal: {t_tree*1e3:.0f} ms", flush=True)

    tree = jax.jit(mktree)(s_codes, s_pos, s_mass, s_vel, s_acc, half)
    n_levels = len(tree.levels)
    budget = kw["worklist_budget"] or bw._auto_budget(npad)
    wl_caps = bw._default_wl_caps(ng, n_levels, budget,
                                  c0=tree.levels[0].code.shape[0])
    print(f"  budget={budget} wl_caps={list(wl_caps)}", flush=True)

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

    variants = [
        ("baseline", ()),
        ("-gather_cell", ("gather_cell",)),
        ("-gather_group", ("gather_group",)),
        ("-emit", ("emit",)),
        ("-sliver", ("sliver",)),
        ("-expand", ("expand",)),
        ("floor(all off)", ("gather_cell", "gather_group", "emit",
                            "sliver", "expand")),
    ]
    base_ms = None
    for name, abl in variants:
        def chain(k, abl=abl):
            @jax.jit
            def run(tree, bbox_min, bbox_max, intervals):
                def body(bb, _):
                    out = bw._traverse_global(
                        tree, bb, bbox_max, ng, **{**tkw,
                                                   "intervals": intervals},
                        ablate=abl)
                    return bb + probe_all(out), None
                out, _ = jax.lax.scan(body, bbox_min, None, length=k)
                return out
            return lambda: run(tree, bbox_min, bbox_max, intervals)

        try:
            tm, t1 = marginal(chain)
            delta = "" if base_ms is None else \
                f"  (phase cost {base_ms - tm*1e3:+.0f} ms)"
            if base_ms is None:
                base_ms = tm * 1e3
            print(f"  traverse[{name}] marginal: {tm*1e3:.0f} ms "
                  f"(t1 {t1*1e3:.0f}){delta}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  traverse[{name}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # --- finish stages on real traversal outputs ---
    out = jax.jit(lambda tree, bb: bw._traverse_global(
        tree, bb, bbox_max, ng, **tkw, ablate=()))(tree, bbox_min)
    _far, far_range, far_n, sl_s, sl_e, sl_n, res, _wl = out

    fin_args = (far_range, far_n, sl_s, sl_e, sl_n, res, s_pos, s_vel,
                s_mass, order, order_pad, pos, s_acc)

    def chain_finish_pool(k):
        cap = bw.pool_cap_tiles(budget, ng, kw["pool_tile"] or 512, npad)

        @jax.jit
        def run(far_range, far_n, sl_s, sl_e, sl_n, res, s_pos, s_vel,
                s_mass, order, order_pad, pos, s_acc):
            def body(c, _):
                lists = bw._finish_pool_ranges(
                    far_range, far_n, sl_s, sl_e, sl_n, res,
                    c, s_vel, s_mass, order, order_pad, pos, n,
                    kw["list_cap"], tile=kw["pool_tile"] or 512,
                    cap_tiles=cap, s_acc=s_acc, near=near)
                return c + probe_all(lists), None
            out, _ = jax.lax.scan(body, s_pos, None, length=k)
            return out
        return lambda: run(*fin_args)

    def chain_finish_dense(k):
        @jax.jit
        def run(far_range, far_n, sl_s, sl_e, sl_n, res, s_pos, s_vel,
                s_mass, order, order_pad, pos, s_acc):
            def body(c, _):
                lists = bw._finish_lists(
                    None, far_range, far_n, sl_s, sl_e, sl_n, res,
                    c, s_vel, s_mass, order, order_pad, pos, n,
                    kw["list_cap"], s_acc=s_acc, near=near)
                return c + probe_all(lists), None
            out, _ = jax.lax.scan(body, s_pos, None, length=k)
            return out
        return lambda: run(*fin_args)

    for name, mk in [("finish_pool", chain_finish_pool),
                     ("finish_dense", chain_finish_dense)]:
        try:
            tm, t1 = marginal(mk)
            print(f"  {name} marginal: {tm*1e3:.0f} ms (t1 {t1*1e3:.0f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    print("done", flush=True)


def _chain_sort(pos, vel, mass, acc, k, presort):
    # Chained sort marginal: perturb pos through the probe.
    @jax.jit
    def run(pos, vel, mass, acc):
        def body(c, _):
            outs = presort(c, vel, mass, acc)
            return c + probe_all(outs), None
        out, _ = jax.lax.scan(body, pos, None, length=k)
        return out
    return run(pos, vel, mass, acc)


if __name__ == "__main__":
    main()
