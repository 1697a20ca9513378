"""Pallas traversal kernel: per-group DFS over a VMEM-resident octree.

The rebuild traversal is the production engine's wall (measured round 3:
~1.72 s of the ~2.2 s rebuild at 1M bodies — scripts/prof_parts.py).
The XLA path (:func:`spatialsim_tpu.ops.bh_window._traverse_global`)
pays per-WORKLIST-SLOT gather/scatter/elementwise costs across static
level caps (~410 ns/slot x 4.2M slots); this kernel walks each group's
subtree SEQUENTIALLY with the whole tree resident in VMEM, so a visit
costs one packed row's scalar reads plus ~20 scalar ops — and the
total visit count is the ACTUAL demand (measured 5.75M pairs at 1M
galaxy), not the static caps.

Design facts (measured 2026-08-18, occupancy study at 1M galaxy,
depth 8):

* **Occupied cells: 215K** (levels [32, 104, 321, 1153, 7420, 37306,
  168665]) — the compacted tree fits VMEM.
* **All table attributes are f32-EXACT at <= 2M bodies**: cell ids
  < 2^18, body indices < 2^21 < 2^24 — so the table is ONE f32 array.
  No int32 rides an f32 BITCAST (the TPU flushes denormals; a bitcast
  transport built 93%-wrong forces in round 3): these are value
  CONVERSIONS of small integers, exact by IEEE.
* Table layout ``(cap/16, 128)``: 16 cells per row, 8 lanes per cell —
  ``[child_start, child_count, body_start, body_end, comx, comy, comz,
  side_sq]`` (32 B/cell; 8.4 MB at cap 262144).  ``side_sq`` stored per
  cell removes all level bookkeeping from the walk.
* **Emission is ranges-only**: an accepted cell is the body range
  ``[body_start, body_end)`` of the frozen sort; moments re-materialize
  outside the kernel from compensated prefix sums
  (bh_window._finish_pool_ranges / _finish_lists far=None path).
* The DFS stack holds (next, end) runs of GLOBAL cell ids (children are
  contiguous in the compacted level order), so its depth is bounded by
  the level count — a tiny SMEM scratch.
* Window-straddling cells clip against the group's covered interval
  [lo, hi) in BODY-INDEX space at ANY level (<= 2 fragments without
  near-groups), which subsumes the XLA path's max-depth "sliver"
  machinery.
* Capacity policy: when a group's list reaches ``L - FOLD_MARGIN`` the
  walk stops OPENING and emits each remaining cell as a coarse range —
  mass-conserving and strictly more accurate than the XLA path's
  merged residual monopole (29/3907 groups saturate at the 1M
  defaults: overflow is routine, not an error).  A hard overflow
  (list completely full) reports far_n = -1; the wrapper's caller
  falls back to the XLA traversal for that build (lax.cond).

Replaces the reference's per-step traversal
(``nbody/simulation.py:201-278``) at production scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spatialsim_tpu.ops.octree import Octree

CELL_LANES = 8           # attrs per cell in the packed table
CELLS_PER_ROW = 16       # 16 cells x 8 lanes = 128 lanes
FOLD_MARGIN = 64         # stop opening this many entries before the cap
STACK_CAP = 24           # DFS run-stack depth bound (>= level count + 8)


def auto_cell_cap(npad: int) -> int:
    """Static packed-table capacity.  Measured occupancy at 1M galaxy
    is ~0.215 cells/body; 0.45/body covers colder distributions with
    2x margin, floored for tiny tests and rounded to the row size."""
    cap = max(32768, int(0.45 * npad))
    return ((cap + CELLS_PER_ROW - 1) // CELLS_PER_ROW) * CELLS_PER_ROW


def pack_tree_table(tree: Octree, cap_cells: int):
    """Flatten + pack the compacted octree into the kernel table.

    Returns ``(table (cap/16, 128) f32, root_n () int32, ok () bool)``.
    Levels are already occupied-compacted with contiguous child runs
    (ops/octree.py); this concatenates them with traced offsets so a
    cell's GLOBAL id = level offset + local id, and child_start remaps
    to global ids.  ``ok`` is False when the occupied total exceeds
    ``cap_cells`` (caller falls back to the XLA traversal).

    Cost: one packed gather over cap_cells slots (a few ms at 1M),
    amortized over the rebuild interval.
    """
    levels = tree.levels
    n_levels = len(levels)
    counts = jnp.stack([lv.n_cells for lv in levels])        # (nl,) traced
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts)]).astype(jnp.int32)
    n_total = offs[-1]
    ok = n_total <= cap_cells

    rows = []
    for li, lv in enumerate(levels):
        level = tree.start_level + li
        side = 2.0 * tree.half / (2 ** level)
        last = li == n_levels - 1
        cs = (jnp.zeros_like(lv.child_start) if last
              else lv.child_start + offs[li + 1])
        cc = (jnp.zeros_like(lv.child_count) if last else lv.child_count)
        packed = jnp.stack([
            cs.astype(jnp.float32),
            cc.astype(jnp.float32),
            lv.body_start.astype(jnp.float32),
            (lv.body_start + lv.count).astype(jnp.float32),
            lv.com[0], lv.com[1], lv.com[2],
            jnp.broadcast_to(side * side, lv.count.shape),
        ])                                                   # (8, C_l)
        # Zero unoccupied slots (empty body range, no children) so a
        # stray visit is harmless.
        occ = jnp.arange(lv.code.shape[0]) < lv.n_cells
        rows.append(jnp.where(occ[None, :], packed, 0.0))

    # Pack into (cap,) slots: slot i = level searchsorted(offs, i),
    # local id i - offs[l]; source column = static level base + local.
    static_offs = [0]
    for lv in levels:
        static_offs.append(static_offs[-1] + lv.code.shape[0])
    allrows = jnp.concatenate(rows, axis=1)                  # (8, sum C_l)
    sbase = jnp.asarray(static_offs[:-1], jnp.int32)
    i = jnp.arange(cap_cells, dtype=jnp.int32)
    lvl = (jnp.searchsorted(offs, i, side="right") - 1).astype(jnp.int32)
    lvl = jnp.clip(lvl, 0, n_levels - 1)
    local = i - offs[lvl]
    src = jnp.where(i < n_total, sbase[lvl] + local, allrows.shape[1])
    flat = jnp.pad(allrows, ((0, 0), (0, 1)))[:, src]        # (8, cap)

    # (8, cap) -> (cap/16, 128): cell k at row k//16, lanes 8*(k%16)+a.
    table = flat.T.reshape(cap_cells // CELLS_PER_ROW,
                           CELLS_PER_ROW * CELL_LANES)
    return table, counts[0], ok


def _traverse_kernel(meta_ref, bounds_ref, table_ref, rng_ref, farn_ref,
                     stack, j, *, list_cap, gsz, wg, theta_sq, soft_sq):
    """One group's DFS.  Scalar-heavy by design: a visit is 8 scalar
    reads of one packed row (static lane offsets within the cell's
    8-lane slot) plus ~20 scalar ops; the VPU idles, but there are only
    ~1.5K visits per group on average (5.75M / 3907 at 1M galaxy).

    meta_ref: (1, 4) SMEM int32 [group_offset, ng_total, root_n, 0]
    bounds_ref: (8, gpp) SMEM f32 skin-dilated group AABBs [min3, max3]
    table_ref: (cap/16, 128) f32 packed cells (VMEM scratch, loaded
      once by program 0)
    rng_ref: (gpp, 2, L) f32 out — [start, end) exact-f32 body ranges
    farn_ref: (1, gpp) int32 out — emitted count, or -1 on overflow
    stack: (STACK_CAP, 2) int32 SMEM — (next, end) global cell-id runs
    j: static group index within the program's gpp batch
    """
    gpp = bounds_ref.shape[1]
    g = pl.program_id(0) * gpp + j + meta_ref[0, 0]
    root_n = meta_ref[0, 2]
    gminx = bounds_ref[0, j]
    gminy = bounds_ref[1, j]
    gminz = bounds_ref[2, j]
    gmaxx = bounds_ref[3, j]
    gmaxy = bounds_ref[4, j]
    gmaxz = bounds_ref[5, j]
    # Covered interval (the Morton window) in body indices — matches
    # bh_window._covered_intervals with near_groups=0 (single merged
    # interval; the window clamp falls out of the emission clips).
    lo = (g - wg) * gsz
    hi = (g + wg + 1) * gsz

    rng_ref[j, :, :] = jnp.zeros((2, list_cap), jnp.float32)
    stack[0, 0] = 0
    stack[0, 1] = root_n

    def cond(state):
        sp, e, lost = state
        return sp >= 0

    def body(state):
        sp, e, lost = state
        s = stack[sp, 0]
        t = stack[sp, 1]
        row = s // CELLS_PER_ROW
        base = (s % CELLS_PER_ROW) * CELL_LANES
        cs = table_ref[row, base + 0].astype(jnp.int32)
        cc = table_ref[row, base + 1].astype(jnp.int32)
        bs = table_ref[row, base + 2].astype(jnp.int32)
        be = table_ref[row, base + 3].astype(jnp.int32)
        cx = table_ref[row, base + 4]
        cy = table_ref[row, base + 5]
        cz = table_ref[row, base + 6]
        side_sq = table_ref[row, base + 7]

        # Pop cell s from the top run.
        more = s + 1 < t

        @pl.when(more)
        def _():
            stack[sp, 0] = s + 1
        sp = jnp.where(more, sp, sp - 1)

        # Acceptance: skin-dilated group AABB to cell COM (identical
        # geometry to _traverse_global).
        gapx = jnp.maximum(jnp.maximum(gminx - cx, cx - gmaxx), 0.0)
        gapy = jnp.maximum(jnp.maximum(gminy - cy, cy - gmaxy), 0.0)
        gapz = jnp.maximum(jnp.maximum(gminz - cz, cz - gmaxz), 0.0)
        dmin_sq = gapx * gapx + gapy * gapy + gapz * gapz + soft_sq
        accept = (side_sq < theta_sq * dmin_sq) | (be - bs <= 1)

        live = be > bs
        inside = (bs >= lo) & (be <= hi)         # window-contained: drop
        overlap = (bs < hi) & (be > lo)
        straddle = live & ~inside & overlap
        outside = live & ~inside & ~overlap
        can_open = (cc > 0) & (e < list_cap - FOLD_MARGIN)

        open_ = (straddle | (outside & ~accept)) & can_open
        emit_whole = outside & ~open_
        emit_clip = straddle & ~open_

        # Up to two emissions: the whole range, or the <= 2 uncovered
        # fragments of a straddling cell ([lo, hi) clip).
        a1 = bs
        b1 = jnp.where(emit_whole, be, jnp.minimum(be, lo))
        em1 = emit_whole | emit_clip
        a2 = jnp.maximum(bs, hi)
        b2 = be
        em2 = emit_clip

        def scatter(e, lost, em, a, b):
            valid = em & (b > a)
            fits = valid & (e < list_cap)
            idx = jnp.where(fits, e, 0)

            @pl.when(fits)
            def _():
                rng_ref[j, 0, idx] = a.astype(jnp.float32)
                rng_ref[j, 1, idx] = b.astype(jnp.float32)
            return (e + fits.astype(jnp.int32),
                    lost + (valid & ~fits).astype(jnp.int32))

        e, lost = scatter(e, lost, em1, a1, b1)
        e, lost = scatter(e, lost, em2, a2, b2)

        # Push the child run.
        spn = jnp.where(open_, sp + 1, sp)

        @pl.when(open_)
        def _():
            stack[spn, 0] = cs
            stack[spn, 1] = cs + cc
        return spn, e, lost

    _, e, lost = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    farn_ref[0, j] = jnp.where(lost > 0, -1, e)


@functools.partial(
    jax.jit,
    static_argnames=("list_cap", "group_size", "window_groups",
                     "theta", "softening", "skin", "groups_per_program",
                     "interpret"))
def pallas_traverse_ranges(table, root_n, bounds_min, bounds_max, *,
                           list_cap, group_size, window_groups, theta,
                           softening, skin, group_offset=0,
                           groups_per_program=4, interpret=None):
    """Per-group far-list RANGES via the VMEM DFS kernel.

    Args:
      table: ``(cap/16, 128)`` f32 packed cells (:func:`pack_tree_table`).
      root_n: () int32 occupied cells of the start level.
      bounds_min / bounds_max: ``(ng, 3)`` f32 raw group AABBs (the skin
        dilation is applied here).
      groups_per_program: DFS walks batched per Pallas program —
        amortizes the ~4 us per-program overhead (3907 single-group
        programs would idle ~15 ms against a ~100-300 ms target).
    Returns:
      ``(far_range (ng, 2, L) int32, far_n (ng,) int32, ok () bool)`` —
      ``ok`` False when any group hit the hard list cap (the caller
      falls back to the XLA traversal for this build).

    The table rides to the kernel in ANY (HBM) memory and is DMA'd ONCE
    into a VMEM scratch by program 0 — a VMEM input block would risk
    Mosaic double-buffering it (2 x 8.4 MB at 1M overflows VMEM).
    Grid iterations execute sequentially on the core, so later programs
    see the completed copy.
    """
    ng = bounds_min.shape[0]
    L = list_cap
    gpp = max(1, groups_per_program)
    ng2 = ((ng + gpp - 1) // gpp) * gpp
    gpad = ng2 - ng
    bounds = jnp.concatenate(
        [(bounds_min - skin).T, (bounds_max + skin).T,
         jnp.zeros((2, ng), jnp.float32)], axis=0)           # (8, ng)
    if gpad:
        # Padding groups: empty AABB far outside the world -> everything
        # is accepted at the root, a few dozen emissions, discarded.
        bounds = jnp.pad(bounds, ((0, 0), (0, gpad)),
                         constant_values=1e18)
    meta = jnp.stack(
        [jnp.asarray(group_offset, jnp.int32), jnp.int32(ng),
         jnp.asarray(root_n, jnp.int32), jnp.int32(0)]).reshape(1, 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ng2 // gpp,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, gpp), lambda g: (0, g),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((gpp, 2, L), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpp), lambda g: (0, g),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_CAP, 2), jnp.int32),
            pltpu.VMEM(table.shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(meta_ref, bounds_ref, table_hbm, rng_ref, farn_ref,
               stack, table_vmem, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cp = pltpu.make_async_copy(table_hbm, table_vmem, sem)
            cp.start()
            cp.wait()
        for j in range(gpp):
            _traverse_kernel(
                meta_ref, bounds_ref, table_vmem, rng_ref, farn_ref,
                stack, j, list_cap=L, gsz=group_size, wg=window_groups,
                theta_sq=float(theta) ** 2,
                soft_sq=float(softening) ** 2)

    rng_f, farn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ng2, 2, L), jnp.float32),
            jax.ShapeDtypeStruct((1, ng2), jnp.int32),
        ],
        interpret=interpret,
    )(meta, bounds, table)

    farn = farn.reshape(ng2)[:ng]
    ok = jnp.all(farn >= 0)
    return (rng_f[:ng].astype(jnp.int32), jnp.maximum(farn, 0), ok)
