"""Pallas traversal kernel: run-vectorized DFS over a VMEM-resident octree.

The rebuild traversal is the production engine's wall (measured round 3:
~1.72 s of the ~2.2 s rebuild at 1M bodies — scripts/prof_parts.py).
The XLA path (:func:`spatialsim_tpu.ops.bh_window._traverse_global`)
pays per-WORKLIST-SLOT gather/scatter/elementwise costs across static
level caps (~410 ns/slot x 4.2M slots); this kernel walks each group's
subtree with the whole tree resident in VMEM.

**Round-4 redesign, driven by on-chip probes** (scripts/decide15.py,
decide17.py stage 1):

* Scalar VMEM loads/stores at a DYNAMIC LANE do not compile on this
  toolchain ("Cannot store scalars to VMEM"; the dyn/dyn load crashed
  Mosaic), and a serialized dynamic-sublane row read costs ~142 ns — so
  the round-3 one-cell-per-visit scalar DFS cannot win.  This version
  therefore processes one RUN of sibling cells per iteration
  (children of one parent are contiguous global ids, <= 8 cells = 64
  lanes of the packed table) with every geometric/window decision
  computed LANE-PARALLEL on the aligned row, and moves exactly ONE
  scalar across the vector->scalar boundary per iteration: a packed
  decision word (2 bits of emission + 1 bit of open per cell,
  f32-exact <= 2^24) reduced into SMEM.
* Emissions append at ENTRY granularity into 64-entry output rows
  ((start, end) pairs interleaved on lanes) via dynamic lane roll +
  masked read-modify-write — the output is DENSE in-kernel, so no XLA
  compaction pass exists.  Dynamic lane rotates synthesize from
  log2(128) conditional static rolls when native dynamic
  ``pltpu.roll`` is unavailable.
* Pushes read (child_start, child_count) as one packed one-hot
  reduction per OPENED cell only.

Table layout and semantics are unchanged from round 3: 16 cells per
128-lane row, 8 attrs per cell ``[child_start, child_count, body_start,
body_end, comx, comy, comz, side_sq]``, all f32-EXACT at <= 2M bodies
(value conversions of small integers — never bitcasts, which the TPU's
denormal flush corrupts).  Window-straddling cells clip against the
group's covered interval in body-index space at ANY level (subsumes the
XLA path's max-depth sliver machinery); at ``list_cap - FOLD_MARGIN``
the walk stops OPENING and emits remaining cells as coarse ranges
(mass-conserving, strictly more accurate than the XLA path's merged
residual monopole); a hard overflow reports ``far_n = -1`` and the
caller falls back to the XLA traversal for that build.

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
RUN_CHUNK = 8            # cells per run slice
RUN_BATCH = 4            # runs popped + processed per batched iteration
ENTRIES_PER_ROW = 64     # (start, end) pairs interleaved on 128 lanes
# Stop opening once within this many entries of the cap; equals the
# max entries one batched iteration can add (RUN_BATCH * RUN_CHUNK * 2),
# so gated opens can never hard-overflow on their own.
FOLD_MARGIN = RUN_BATCH * RUN_CHUNK * 2
# Run-stack bound: one iteration pops RUN_BATCH entries but can push
# back RUN_BATCH remainders + RUN_BATCH*RUN_CHUNK child runs; depth is
# bounded by ~ (RUN_BATCH*RUN_CHUNK + RUN_BATCH) per tree level.
STACK_CAP = 384

# VMEM budget for the packed table (the 16 MB scoped-vmem limit must
# also hold the double-buffered output blocks and temporaries).
_TABLE_BYTES_MAX = 11 * 1024 * 1024


def auto_cell_cap(npad: int) -> int:
    """Static packed-table capacity.  Measured occupancy at 1M galaxy
    is ~0.215 cells/body; 0.30/body gives ~1.4x margin (overflow falls
    back to the XLA traversal via the ``ok`` flag), floored for tiny
    tests and rounded to 128 cells (8 table rows) so the row count
    tiles."""
    cap = max(32768, int(0.30 * npad))
    return ((cap + 127) // 128) * 128


def kernel_feasible(npad: int) -> bool:
    """Whole-tree VMEM residency bound: the packed table must leave
    room for the output blocks inside the 16 MB scoped-vmem limit."""
    rows = auto_cell_cap(npad) // CELLS_PER_ROW + 8
    return rows * 128 * 4 <= _TABLE_BYTES_MAX


def pack_tree_table(tree: Octree, cap_cells: int):
    """Flatten + pack the compacted octree into the kernel table.

    Returns ``(table (cap/16 + 8, 128) f32, root_n () int32, ok ()
    bool)``.  Levels are already occupied-compacted with contiguous
    child runs (ops/octree.py); this concatenates them with traced
    offsets so a cell's GLOBAL id = level offset + local id, and
    child_start remaps to global ids.  ``ok`` is False when the
    occupied total exceeds ``cap_cells`` (caller falls back to the XLA
    traversal).  8 zero rows pad the tail so the kernel's straddle-safe
    two-row reads stay in bounds.

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
    table = jnp.pad(table, ((0, 8), (0, 0)))
    return table, counts[0], ok


def _dyn_roll(v, amt):
    """Right-rotate the 128 lanes of ``v`` by the traced scalar ``amt``
    (non-negative).  Native dynamic-shift ``pltpu.roll`` compiles and
    runs on this toolchain (scripts/decide15.py round-4 probe)."""
    return pltpu.roll(v, amt, 1)


def _walk_group(j, meta_ref, bounds_ref, table, rng_ref, farn_ref, stack,
                smem_f, *, list_cap, gsz, wg, theta_sq, soft_sq, skin,
                gpp):
    """One group's run-vectorized DFS (see module docstring).

    j: static group index within the program's gpp batch
    bounds_ref: (1, 8, gpp) SMEM f32 raw group AABBs [min3, max3, 0, 0]
    table: (rows, 128) f32 packed cells in VMEM
    rng_ref: (gpp, L/64, 128) VMEM out — entry m of the group lives at
      row m//64, lanes (2(m%64), 2(m%64)+1) as exact-f32 (start, end)
    farn_ref: (1, 2, gpp) SMEM out — [emitted count | -1 on overflow, 0]
    stack: (STACK_CAP, 2) int32 SMEM — (next, end) global cell-id runs
    smem_f: (1, 8) f32 SMEM — vector->scalar reduction mailbox
    """
    L = list_cap
    g = pl.program_id(0) * gpp + j + meta_ref[0, 0]
    root_n = meta_ref[0, 2]
    gminx = bounds_ref[0, 0, j] - skin
    gminy = bounds_ref[0, 1, j] - skin
    gminz = bounds_ref[0, 2, j] - skin
    gmaxx = bounds_ref[0, 3, j] + skin
    gmaxy = bounds_ref[0, 4, j] + skin
    gmaxz = bounds_ref[0, 5, j] + skin
    # Covered interval (the Morton window) in body indices — matches
    # bh_window._covered_intervals with near_groups=0 (single merged
    # interval; the window clamp falls out of the emission clips).
    lo_f = ((g - wg) * gsz).astype(jnp.float32)
    hi_f = ((g + wg + 1) * gsz).astype(jnp.float32)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lmod = lanes % CELL_LANES
    lcell = lanes // CELL_LANES
    cell_ok = (lmod == 0) & (lcell < RUN_CHUNK)
    # Decision-word weights: emission digit (base 4) at bits 2k,
    # open bit at bit 16+k; total < 2^24, f32-exact.
    w_emit = jnp.where(cell_ok, 1 << (2 * lcell), 0).astype(jnp.float32)
    w_open = jnp.where(cell_ok, 65536 << lcell, 0).astype(jnp.float32)

    stack[0, 0] = 0
    stack[0, 1] = root_n

    def append(cond, pair, e, lost, acc_row):
        """Append one (start, end) pair to the group's dense output.

        Entries accumulate in the carried ``acc_row`` REGISTER (a
        dynamic lane roll + masked select, no memory traffic) and flush
        to the output row only when its 64th entry lands — a
        dynamic-sublane VMEM access costs ~140 ns serialized (measured),
        so per-entry read-modify-writes would dominate the walk."""
        fits = cond & (e < L)
        m = 2 * (e % ENTRIES_PER_ROW)
        pr = _dyn_roll(pair, m)
        sel = fits & ((lanes == m) | (lanes == m + 1))
        acc_new = jnp.where(sel, pr, acc_row)
        full = fits & (m == 2 * (ENTRIES_PER_ROW - 1))

        @pl.when(full)
        def _():
            rng_ref[j, pl.ds(e // ENTRIES_PER_ROW, 1), :] = acc_new
        return (e + jnp.where(fits, 1, 0),
                lost + jnp.where(cond & ~fits, 1, 0),
                jnp.where(full, 0.0, acc_new))

    def cond(state):
        sp, e, lost, acc_row = state
        return sp >= 0

    def run_phase1(q, s, t, chunk, e_ok):
        """One run's vector stage: read, align, decide; the decision
        word lands in smem_f[0, q].  Returns the registers phase 2
        needs (aligned row for push extraction, pair prototypes)."""
        # Aligned run row: cells s..s+chunk-1 at lanes 8k..8k+7.
        row = s // CELLS_PER_ROW
        base8 = (s % CELLS_PER_ROW) * CELL_LANES
        blk = table[pl.ds(row, 2), :]
        amt = (128 - base8) % 128
        a0 = _dyn_roll(blk[0:1, :], amt)
        a1 = _dyn_roll(blk[1:2, :], amt)
        al = jnp.where(lanes < 128 - base8, a0, a1)

        # Per-attr views at each cell's lane 8k (left-rotate by c).
        def view(c):
            return pltpu.roll(al, 128 - c, 1)
        ccv = view(1)
        bsv = view(2)
        bev = view(3)
        cxv = view(4)
        cyv = view(5)
        czv = view(6)
        ssv = view(7)

        # Acceptance: skin-dilated group AABB to cell COM — identical
        # float ops, in the same order, as _traverse_global (sum order
        # (x^2 + y^2) + z^2, soft_sq added before the theta product).
        gx = jnp.maximum(jnp.maximum(gminx - cxv, cxv - gmaxx), 0.0)
        gy = jnp.maximum(jnp.maximum(gminy - cyv, cyv - gmaxy), 0.0)
        gz = jnp.maximum(jnp.maximum(gminz - czv, czv - gmaxz), 0.0)
        dmin_sq = (gx * gx + gy * gy) + gz * gz + soft_sq
        accept = (ssv < theta_sq * dmin_sq) | (bev - bsv <= 1.0)

        validv = lanes < chunk * CELL_LANES
        live = (bev > bsv) & validv
        inside = (bsv >= lo_f) & (bev <= hi_f)
        ovl = (bsv < hi_f) & (bev > lo_f)
        straddle = live & ~inside & ovl
        outside = live & ~inside & ~ovl
        openv = (straddle | (outside & ~accept)) & (ccv > 0.0) & e_ok
        emw = outside & ~openv
        emc = straddle & ~openv

        # Fragment values (exact small ints in f32): frag1 = the whole
        # range, or the below-window clip; frag2 = the above-window clip.
        b1v = jnp.where(emw, bev, jnp.minimum(bev, lo_f))
        em1 = (emw | emc) & (b1v > bsv)
        a2v = jnp.maximum(bsv, hi_f)
        em2 = emc & (bev > a2v)

        dec = (jnp.where(em1, 1.0, 0.0) + jnp.where(em2, 2.0, 0.0))
        open_f = jnp.where(openv, 1.0, 0.0)
        smem_f[0, q] = jnp.sum(dec * w_emit + open_f * w_open)

        # (start, end) pair prototypes: value at lane 8k, partner at
        # 8k+1 (right-rotate the partner view by one lane).
        p1 = (jnp.where(lmod == 0, bsv, 0.0)
              + jnp.where(lmod == 1, pltpu.roll(b1v, 1, 1), 0.0))
        p2 = (jnp.where(lmod == 0, a2v, 0.0)
              + jnp.where(lmod == 1, pltpu.roll(bev, 1, 1), 0.0))
        return al, p1, p2

    def body(state):
        """One BATCHED iteration: pop up to RUN_BATCH runs, issue their
        reads + decision-word reductions back-to-back (the composite
        iteration core amortizes 1646 -> 415 ns/run from k1 to k4 —
        decide18), then decode all words and do the scalar work
        (appends, child pushes, remainder push-backs)."""
        sp, e, lost, acc_row = state
        q_avail = jnp.minimum(sp + 1, RUN_BATCH)
        # Fold guard shared by the whole batch: at most RUN_BATCH * 16
        # new entries per iteration = FOLD_MARGIN, so opens gated here
        # can never hard-overflow the list by themselves.
        e_ok = e < L - FOLD_MARGIN

        runs = []
        for q in range(RUN_BATCH):
            active = q < q_avail
            idx = jnp.maximum(sp - q, 0)
            s = stack[idx, 0]
            t = stack[idx, 1]
            chunk = jnp.where(active, jnp.minimum(t - s, RUN_CHUNK), 0)
            al, p1, p2 = run_phase1(q, s, t, chunk, e_ok)
            runs.append((active, s, t, al, p1, p2))
        sp = sp - q_avail

        for q in range(RUN_BATCH):
            active, s, t, al, p1, p2 = runs[q]
            w = smem_f[0, q].astype(jnp.int32)
            for k in range(RUN_CHUNK):
                dk = (w >> (2 * k)) & 3
                shift = (128 - CELL_LANES * k) % 128
                e, lost, acc_row = append(
                    (dk & 1) == 1, pltpu.roll(p1, shift, 1), e, lost,
                    acc_row)
                e, lost, acc_row = append(
                    (dk & 2) == 2, pltpu.roll(p2, shift, 1), e, lost,
                    acc_row)

                po = ((w >> (16 + k)) & 1) == 1
                tgt = sp + 1

                @pl.when(po)
                def _(k=k, tgt=tgt, al=al):
                    # (child_start, child_count) as ONE packed one-hot
                    # reduction: cs*16 + cc <= 2^22, f32-exact.
                    smem_f[0, RUN_BATCH] = jnp.sum(
                        jnp.where(lanes == CELL_LANES * k,
                                  al * 16.0, 0.0)
                        + jnp.where(lanes == CELL_LANES * k + 1,
                                    al, 0.0))
                    pk = smem_f[0, RUN_BATCH].astype(jnp.int32)
                    cs = pk >> 4
                    stack[tgt, 0] = cs
                    stack[tgt, 1] = cs + (pk & 15)
                sp = sp + jnp.where(po, 1, 0)

            # Remainder push-back: the batch pops whole stack entries,
            # so a run longer than RUN_CHUNK returns its tail.
            rem = active & (t - s > RUN_CHUNK)
            tgt = sp + 1

            @pl.when(rem)
            def _(tgt=tgt, s=s, t=t):
                stack[tgt, 0] = s + RUN_CHUNK
                stack[tgt, 1] = t
            sp = sp + jnp.where(rem, 1, 0)
        return sp, e, lost, acc_row

    _, e, lost, acc_row = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                     jnp.zeros((1, 128), jnp.float32)))

    # Flush the partial last output row.
    @pl.when(e % ENTRIES_PER_ROW != 0)
    def _():
        rng_ref[j, pl.ds(e // ENTRIES_PER_ROW, 1), :] = acc_row
    farn_ref[0, 0, j] = jnp.where(lost > 0, -1, e)
    farn_ref[0, 1, j] = 0


@functools.partial(
    jax.jit,
    static_argnames=("list_cap", "group_size", "window_groups",
                     "theta", "softening", "skin", "groups_per_program",
                     "interpret"))
def pallas_traverse_ranges(table, root_n, bounds_min, bounds_max, *,
                           list_cap, group_size, window_groups, theta,
                           softening, skin, group_offset=0,
                           groups_per_program=4, interpret=None):
    """Per-group far-list RANGES via the run-vectorized VMEM DFS kernel.

    Args:
      table: ``(rows, 128)`` f32 packed cells (:func:`pack_tree_table`).
      root_n: () int32 occupied cells of the start level.
      bounds_min / bounds_max: ``(ng, 3)`` f32 raw group AABBs (the skin
        dilation is applied in-kernel).
      groups_per_program: DFS walks batched per Pallas program —
        amortizes the per-program pipeline overhead.
    Returns:
      ``(far_range (ng, 2, L) int32, far_n (ng,) int32, ok () bool)`` —
      ``ok`` False when any group hit the hard list cap (the caller
      falls back to the XLA traversal for this build).

    The table rides to the kernel in ANY (HBM) memory and is DMA'd ONCE
    into a VMEM scratch by program 0 — a VMEM input block would risk
    Mosaic double-buffering it (2 x ~9.6 MB at 1M overflows VMEM).
    Grid iterations execute sequentially on the core, so later programs
    see the completed copy.
    """
    ng = bounds_min.shape[0]
    L = list_cap
    assert L % ENTRIES_PER_ROW == 0, "list_cap must be a multiple of 64"
    rrows = L // ENTRIES_PER_ROW
    gpp = max(1, groups_per_program)
    ng2 = ((ng + gpp - 1) // gpp) * gpp
    gpad = ng2 - ng
    bounds = jnp.concatenate(
        [bounds_min.T, bounds_max.T,
         jnp.zeros((2, ng), jnp.float32)], axis=0)           # (8, ng)
    if gpad:
        # Padding groups: empty AABB far outside the world -> everything
        # is accepted at the root, a few dozen emissions, discarded.
        bounds = jnp.pad(bounds, ((0, 0), (0, gpad)),
                         constant_values=1e15)
    bounds = bounds.T.reshape(ng2 // gpp, gpp, 8).transpose(0, 2, 1)
    meta = jnp.stack(
        [jnp.asarray(group_offset, jnp.int32), jnp.int32(ng),
         jnp.asarray(root_n, jnp.int32), jnp.int32(0)]).reshape(1, 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ng2 // gpp,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, gpp), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((gpp, rrows, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, gpp), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_CAP, 2), jnp.int32),
            pltpu.SMEM((1, 8), jnp.float32),
            pltpu.VMEM(table.shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(meta_ref, bounds_ref, table_hbm, rng_ref, farn_ref,
               stack, smem_f, table_vmem, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            cp = pltpu.make_async_copy(table_hbm, table_vmem, sem)
            cp.start()
            cp.wait()
        for j in range(gpp):
            _walk_group(
                j, meta_ref, bounds_ref, table_vmem, rng_ref, farn_ref,
                stack, smem_f, list_cap=L, gsz=group_size,
                wg=window_groups, theta_sq=float(theta) ** 2,
                soft_sq=float(softening) ** 2, skin=float(skin),
                gpp=gpp)

    rng_f, farn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ng2, rrows, 128), jnp.float32),
            jax.ShapeDtypeStruct((ng2 // gpp, 2, gpp), jnp.int32),
        ],
        interpret=interpret,
    )(meta, bounds, table)

    farn = farn[:, 0, :].reshape(ng2)[:ng]
    ok = jnp.all(farn >= 0)
    far_n = jnp.maximum(farn, 0)
    # Entry m lives at (row m//64, lanes 2(m%64) + {0, 1}): reshape to
    # (ng, rows, 64, 2) and fold rows x 64 into the entry axis.
    ranges = rng_f[:ng].reshape(ng, rrows, ENTRIES_PER_ROW, 2)
    ranges = ranges.transpose(0, 3, 1, 2).reshape(ng, 2, L)
    mask = (jnp.arange(L, dtype=jnp.int32)[None, None, :]
            < far_n[:, None, None])
    far_range = jnp.where(mask, ranges, 0.0).astype(jnp.int32)
    return far_range, far_n, ok
