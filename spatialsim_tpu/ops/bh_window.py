"""Production Barnes-Hut engine: amortized lists + dense per-step eval.

Motivation (measured on the target chip): XLA scatter/gather costs ~6 ns
per element and per-dispatch latency is ~30 ms, so any per-step algorithm
with tens of millions of bookkeeping elements is memory-bound long before
the force FLOPs matter.  This engine moves ALL data-dependent bookkeeping
into a periodic REBUILD and makes the per-step work purely dense:

* **Rebuild** (every ``rebuild_interval`` steps, or sooner if any body
  drifts more than ``skin/2`` since the last build — the Verlet-list
  criterion): Morton-sort, build the octree, and run the group traversal
  once, emitting per-group **far lists**.  Acceptance uses the group AABB
  dilated by ``skin``, so every list remains at least as accurate as the
  reference's per-body ``s/d < θ`` (``nbody/simulation.py:256-258``) until
  drift forces the next rebuild.
* **Far field**: each accepted cell is frozen as ``(com₀, v₀, mass[, Q,
  a₀])`` with ``v₀``/``a₀`` the mass-weighted mean velocity/acceleration;
  between rebuilds the entry advances as ``com₀ + v₀·τ + a₀·τ²/2`` with
  the quadratic term's velocity correction clamped at the orbital
  curvature horizon (``advance_tau_clamp``).  Measured at 1M galaxy
  θ=0.8 (scripts/staleness_scan.py): the ballistic advance alone reaches
  23% rms force error by τ=24 (the ½|a|τ² term in the core); the
  second-order advance holds 8% at τ=24 but overshoots past τ≈48 as the
  frozen ``a`` rotates — hence the clamp and the default rebuild
  interval.  Per-step far evaluation reads only dense ``(groups, R, L)``
  tensors: no gathers, no scatters.
* **Near field**: every group interacts exactly (softened direct sum)
  with the Morton **window** of ``2·window_groups+1`` neighbouring groups
  — pure shifted slices of the sorted state.  The traversal drops cells
  wholly inside the window and never θ-accepts cells that straddle its
  boundary (it keeps opening them; at max depth the out-of-window slivers
  are emitted as clipped-range monopoles), so nothing is double counted.
* All pairwise math is evaluated in **group-centred coordinates** so the
  MXU-friendly ``|a|² + |b|² − 2a·b`` distance form does not lose
  precision to f32 cancellation at large world coordinates.

The exact engine (:mod:`spatialsim_tpu.ops.barnes_hut`) remains the
reference-parity path; this one trades bounded, skin-controlled staleness
for an order-of-magnitude step-rate improvement.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from spatialsim_tpu.ops.bounds import compute_bounds
from spatialsim_tpu.ops.morton import morton_encode
from spatialsim_tpu.ops.octree import build_octree
from spatialsim_tpu.ops.integrator import integrate


def far_layout(n_rows: int):
    """(quadrupole?, acc_row_offset | None) from a far tensor's row count.

    Layouts: 8 = [com3, v3, m, pad] monopole; 10 adds mean acceleration
    (rows 7:10); 13 = monopole + traceless quadrupole (7:13); 16 = both
    (q 7:13, acc 13:16).  The 10-row acc-only layout is what makes the
    second-order advance affordable at EXTREME scale: the 16-row tensor
    at 10M bodies is 5.1 GB of which 6 rows were zero-filled Q padding.
    """
    quad = n_rows in (13, 16)
    acc0 = (13 if quad else 7) if n_rows in (10, 16) else None
    return quad, acc0


class BHLists(NamedTuple):
    """Amortized interaction structure (all shapes static)."""

    order: jax.Array        # (Npad,) int32 sorted slot -> ORIGINAL body id
    inv_order: jax.Array    # (N,) int32 original id -> sorted slot
    # far rows: see far_layout() — 8 plain monopole, 10 with mean
    # acceleration, 13 with traceless quadrupole, 16 with both.
    far: jax.Array          # (ng, R, L) f32
    far_n: jax.Array        # (ng,) int32 actual entry counts
    ref_pos: jax.Array      # (3, N) sorted positions at build (drift check)
    steps_since: jax.Array  # () int32 steps since build
    # Spatial neighbour groups (config.near_groups): (ng, K) int32 global
    # group ids whose bodies join the exact near field, -1 = none.
    # None/(ng, 0) when the feature is off.
    near: jax.Array | None = None
    # Sorted-order body range [start, end) behind each far entry —
    # (ng, 2, L) int32, (0, 0) for the residual slot.  Lets
    # :func:`refresh_lists` re-materialize every entry's moments from
    # prefix sums over the CURRENT state without re-sorting or
    # re-traversing (cells are contiguous runs of the frozen sort).
    far_range: jax.Array | None = None
    # Steps since the last FULL rebuild (drives the rebuild policy);
    # ``steps_since`` counts since the last refresh (drives the frozen-
    # entry advance τ).  Equal when refresh is off.
    steps_build: jax.Array | None = None
    # COMPACTED tile pool of the far lists (:func:`build_pool`):
    # (cap_tiles, 16, tile) f32, rows [com3, vel3, mass, acc3,
    # fs_hi, fs_lo, fe_hi, fe_lo, 0, 0] — group g's entries live in
    # tiles [pstart[g], pstart[g] + ceil(far_n[g]/tile)), each a
    # contiguous 16*tile*4-byte block the eval kernel streams with
    # double-buffered manual DMA.  Cuts far HBM ~4-5x vs the dense
    # (ng, R, L) tensor (whose fixed-cap blocks the eval fetched whole)
    # and refresh gathers ~4x.  None = dense layout (sharded /
    # quadrupole paths).
    pool: jax.Array | None = None
    pstart: jax.Array | None = None   # (ng,) int32 first pool tile
    # NOTE: entries are rows-major x entries-minor so the minor (lane)
    # dimension is the large one — (entries, R) layouts pad R -> 128 on
    # TPU (up to 16x HBM blowup).


def _select_near_groups(bmin, bmax, K, wg, group_offset, ng_local):
    """K spatially-nearest groups per local group, by bbox gap.

    ``bmin``/``bmax``: (ng_total, 3) GLOBAL group bounding boxes (the
    sort is replicated, so every shard sees all candidates).  Returns
    (ng_local, K) int32 global ids, -1 where no qualifying neighbour.

    Selection is a perf/accuracy knob, not a correctness one: whatever
    set is chosen here is exactly the set the traversal drops and the
    eval reads, so coverage stays consistent by construction.  Ranked by
    CONTACT VOLUME of the margin-dilated boxes (spatial tiles all sit at
    bbox gap ~ 0, so gap can't rank them; shared-face area can).
    Morton-window members (|Δg| <= wg) and self are excluded.
    """
    ng_t = bmin.shape[0]
    r_all = 0.5 * jnp.linalg.norm(bmax - bmin, axis=1)        # (ng_t,)
    gid_all = jnp.arange(ng_t, dtype=jnp.int32)

    chunk = 512
    ngl_pad = ((ng_local + chunk - 1) // chunk) * chunk

    def one_chunk(c0):
        rows = c0 + jnp.arange(chunk)
        rows_c = jnp.clip(rows, 0, ng_t - 1)
        tmin = bmin[rows_c]                                   # (c, 3)
        tmax = bmax[rows_c]
        # Contact volume of the margin-dilated boxes: face-adjacent
        # neighbours (large shared surface) dominate seam traffic, and
        # gap alone can't rank them — spatial tiles all sit at gap ~ 0.
        m = 0.25 * r_all[rows_c][:, None, None]               # (c, 1, 1)
        ov = (jnp.minimum(tmax[:, None, :], bmax[None, :, :])
              - jnp.maximum(tmin[:, None, :], bmin[None, :, :])
              + 2.0 * m)                                      # (c, ng_t, 3)
        contact = jnp.prod(jnp.maximum(ov, 0.0), axis=2)      # (c, ng_t)
        gidg = rows_c + group_offset
        excl = jnp.abs(gid_all[None, :] - gidg[:, None]) <= wg
        score = jnp.where(excl, 0.0, contact)
        top, ids = jax.lax.top_k(score, K)
        return jnp.where(top > 0.0, ids, -1).astype(jnp.int32)

    starts = jnp.arange(ngl_pad // chunk) * chunk
    near = jax.lax.map(one_chunk, starts).reshape(ngl_pad, K)
    return near[:ng_local]


def _covered_intervals(near, wg, group_offset, gsz):
    """Merged, sorted, half-open covered intervals in BODY units.

    Covered = the Morton window [g-wg, g+wg] plus each near-group id,
    merged where adjacent/overlapping.  Returns (ng_local, M, 2) int32
    with M = K + 1; empty slots carry a far-right sentinel so
    containment/overlap tests fail naturally.  Sorted ascending by
    start (required by the sliver clip's running-pointer walk).
    """
    ngl, K = near.shape
    BIGG = jnp.int32(1_000_000)      # group units; * gsz stays < 2^31
    gid = jnp.arange(ngl, dtype=jnp.int32) + group_offset
    starts = jnp.concatenate(
        [(gid - wg)[:, None],
         jnp.where(near >= 0, near, BIGG)], axis=1)           # (ngl, K+1)
    ends = jnp.concatenate(
        [(gid + wg + 1)[:, None],
         jnp.where(near >= 0, near + 1, BIGG)], axis=1)
    o = jnp.argsort(starts, axis=1)
    starts = jnp.take_along_axis(starts, o, axis=1)
    ends = jnp.take_along_axis(ends, o, axis=1)

    out_s, out_e = [], []
    cur_s, cur_e = starts[:, 0], ends[:, 0]
    for i in range(1, K + 1):
        s_i, e_i = starts[:, i], ends[:, i]
        new = s_i > cur_e                    # half-open: touching merges
        out_s.append(jnp.where(new, cur_s, BIGG))
        out_e.append(jnp.where(new, cur_e, BIGG))
        cur_s = jnp.where(new, s_i, cur_s)
        cur_e = jnp.where(new, e_i, jnp.maximum(cur_e, e_i))
    out_s.append(cur_s)
    out_e.append(cur_e)
    s = jnp.stack(out_s, axis=1)
    e = jnp.stack(out_e, axis=1)
    # Closed intervals were emitted in ascending order but interleaved
    # with sentinels; one tiny sort puts sentinels last.
    o2 = jnp.argsort(s, axis=1)
    s = jnp.take_along_axis(s, o2, axis=1) * gsz
    e = jnp.take_along_axis(e, o2, axis=1) * gsz
    return jnp.stack([s, e], axis=2)                          # (ngl, M, 2)


def _exclusive_cumsum(x):
    return jnp.cumsum(x) - x


def _comp_prefix(x):
    """Compensated (hi+lo double-f32) inclusive prefix, 0-led.

    ``x``: (P, npad) rows.  Returns (2P, npad+1) stacked [hi; lo].

    A plain f32 cumsum rounds every partial to ulp(global magnitude), so
    a SHORT segment recovered as ``pref[e] - pref[s]`` loses nearly all
    its bits once the running sum dwarfs it — at 10M bodies a
    single-body mass extracted from a ~1.25e7 prefix is wrong by O(1),
    and m·x rows are worse (measured: 1-body far entries off by ~1.5
    units of com at 65K bodies already).  Fast2Sum recovers each
    accumulation step's rounding error exactly (when |Σ| >= |x_i|;
    otherwise it is bounded by the local element's own ulp, which f32
    data carries anyway), and ``lo`` accumulates those residuals.  At
    use (:func:`_comp_seg`) the hi difference is EXACT by Sterbenz's
    lemma precisely in the dangerous close-values case, and adding the
    lo difference restores the lost bits — ~48-bit segment sums from
    pure f32 ops, with hi and lo riding the SAME packed gather (per-
    index gather cost unchanged).
    """
    hi = jnp.cumsum(x, axis=1)
    hi_prev = jnp.concatenate(
        [jnp.zeros_like(hi[:, :1]), hi[:, :-1]], axis=1)
    r = (hi_prev - hi) + x                    # Fast2Sum residual
    lo = jnp.cumsum(r, axis=1)
    z = jnp.zeros_like(hi[:, :1])
    return jnp.concatenate(
        [jnp.concatenate([z, hi], axis=1),
         jnp.concatenate([z, lo], axis=1)], axis=0)


# One packed endpoint gather materializes a (2P, M) f32 temp; at the
# EXTREME flat widths (ng*L = 100M at 50M bodies) the pair of them is
# ~12 GB and was the round-4 50M OOM.  Chunk flat inputs above this.
_COMP_SEG_CHUNK = 1 << 22


def _comp_seg(pref2, s, e):
    """Segment sums over compensated prefixes (see :func:`_comp_prefix`).

    ``s``/``e`` are int index arrays of any matching shape; returns
    (P,) + s.shape segment sums.  Flat inputs wider than
    ``_COMP_SEG_CHUNK`` are processed in bounded chunks via
    :func:`jax.lax.map` so the (2P, M) gather temps never exceed a few
    hundred MB regardless of scale.
    """
    P = pref2.shape[0] // 2
    M = s.size
    if s.ndim != 1 or M <= _COMP_SEG_CHUNK:
        d = pref2[:, e] - pref2[:, s]         # 2 packed gathers
        return d[:P] + d[P:]
    CH = _COMP_SEG_CHUNK
    nch = -(-M // CH)
    pad = nch * CH - M
    sp = jnp.pad(s, (0, pad))
    ep = jnp.pad(e, (0, pad))

    def body(args):
        s_c, e_c = args
        d = pref2[:, e_c] - pref2[:, s_c]
        return d[:P] + d[P:]

    out = jax.lax.map(body, (sp.reshape(nch, CH), ep.reshape(nch, CH)))
    return out.transpose(1, 0, 2).reshape(P, nch * CH)[:, :M]


# ---------------------------------------------------------------------------
# Scatter-free compaction: within-tile compact + run-reconstruction assembly
# ---------------------------------------------------------------------------

# Tile width for _tile_compact.  Small tiles keep the per-tile work
# (sort network / one-hot operand) cheap; the cross-tile assembly cost
# is tile-invariant.  32 = one subword-register row pair.
_COMPACT_TILE = 32


def _tile_compact(mask, payloads, tile=_COMPACT_TILE, method="sort"):
    """Stable within-tile compaction of masked entries, scatter-free.

    ``mask``: (W,) bool, W a multiple of ``tile``.  ``payloads``: tuple of
    (W,) int32 columns.  Within every run of ``tile`` consecutive slots,
    the masked entries' payloads are moved to the run's front (original
    order kept); slots past the run's count are unspecified.  Returns
    ``(compacted (k, W) int32, counts (W//tile,) int32)``.

    Why: an XLA scatter pays its per-update tax on ALL W updates even
    when most are masked off (``mode="drop"`` does not skip them) — the
    emission scatters were the single largest phase of the 1M rebuild
    (decide21_v2: +562 ms).  Both methods below are dense vector/matrix
    programs whose cost rides bandwidth, not per-element serialization:

    * ``"sort"``: one stable variadic sort of each (tile,)-run keyed by
      ~mask — a fixed comparator network over the minor axis, int32
      payloads carried exactly.
    * ``"matmul"``: rank one-hot (T, tile, tile) contracted against the
      payload columns on the MXU.  Payloads are split into 12-bit halves
      so every product is exact in bf16-pass f32 matmuls.
    """
    W = mask.shape[0]
    assert W % tile == 0
    T = W // tile
    m = mask.reshape(T, tile)
    mi = m.astype(jnp.int32)
    counts = jnp.sum(mi, axis=1)
    if method == "sort":
        key = 1 - mi                            # masked first, stable
        ops = (key,) + tuple(p.reshape(T, tile) for p in payloads)
        out = jax.lax.sort(ops, dimension=1, is_stable=True, num_keys=1)
        return jnp.stack([o.reshape(W) for o in out[1:]]), counts
    # matmul: out[t, j] = Σ_i onehot[t, i, j] · payload[t, i]
    rank = jnp.cumsum(mi, axis=1) - mi
    iota = jnp.arange(tile, dtype=jnp.int32)
    oh = ((rank[:, :, None] == iota[None, None, :]) & m[:, :, None])
    ohf = oh.astype(jnp.float32)
    cols = []
    for p in payloads:
        pt = p.reshape(T, tile)
        cols.append((pt >> 12).astype(jnp.float32))
        cols.append((pt & 0xFFF).astype(jnp.float32))
    pay = jnp.stack(cols, axis=2)               # (T, tile, 2k)
    out = jax.lax.dot_general(
        ohf, pay, (((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)    # (T, tile, 2k)
    oi = out.astype(jnp.int32)
    merged = [(oi[:, :, 2 * i] << 12) | oi[:, :, 2 * i + 1]
              for i in range(len(payloads))]
    return jnp.stack([mm.reshape(W) for mm in merged]), counts


def _tile_assemble(counts, payload_tiles, cap, tile=_COMPACT_TILE):
    """Concatenate per-tile compacted prefixes into dense (k, cap) arrays.

    ``counts``: (T,) per-tile entry counts; ``payload_tiles``: (k, T*tile)
    within-tile-compacted columns (:func:`_tile_compact`).  Entries keep
    their global order.  Scatter work is T-domain only (run descriptors);
    everything per-entry is dense cumsum + packed gathers.  Returns
    ``(dense (k, cap) int32 — zero past ``total`` —, total int32)``.
    Entries past ``cap`` are dropped (callers size ``cap`` to the exact
    emission bound or fold the overflow themselves).
    """
    T = counts.shape[0]
    base = jnp.cumsum(counts) - counts
    total = jnp.minimum(base[-1] + counts[-1], cap)
    has = counts > 0
    hi = jnp.cumsum(has.astype(jnp.int32)) - has
    rpos = jnp.where(has, hi, T)
    run_tile = jnp.zeros((T,), jnp.int32).at[rpos].set(
        jnp.arange(T, dtype=jnp.int32), mode="drop")
    run_base = jnp.zeros((T,), jnp.int32).at[rpos].set(base, mode="drop")
    # Bases of nonempty tiles are strictly increasing -> distinct marks.
    mark = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(has, jnp.minimum(base, cap), cap)].set(1, mode="drop")
    seg = jnp.clip(jnp.cumsum(mark) - 1, 0, T - 1)
    slot = jnp.arange(cap, dtype=jnp.int32)
    runs = jnp.stack([run_tile, run_base])
    rt = runs[:, seg] if cap <= 8_000_000 else jnp.stack(
        [run_tile[seg], run_base[seg]])
    live = slot < total
    src = jnp.where(live, rt[0] * tile + (slot - rt[1]), 0)
    if cap <= 8_000_000 and payload_tiles.shape[0] > 1:
        out = payload_tiles[:, src]
    else:
        out = jnp.stack([payload_tiles[r][src]
                         for r in range(payload_tiles.shape[0])])
    return jnp.where(live[None, :], out, 0), total


# ---------------------------------------------------------------------------
# Rebuild: traversal emitting clipped far ranges
# ---------------------------------------------------------------------------

SLIVER_CAP = 64  # >= 4 emissions/level x levels; deterministic bound
# Pool-assembly tiles per chunk (_finish_pool_cellid): blocks of
# ~CHT*tile slots bound the assembly transient regardless of scale.
_POOL_ASM_CHUNK = 8192
# Straddle-emission compaction capacity, per group per level: boundary
# cuts of the covered union are ~(2 + 2*near_groups) per group, so 16
# is generous.  Overflow drops the fragment (documented tiny mass leak
# on pathological densities) rather than paying W-wide scatters.
SL_COMPACT_PER_GROUP = 16


def _pack_levels(tree, quadrupole, with_acc):
    """Per-level packed attribute tensors for single-gather traversal.

    XLA's random-access cost on this chip is per-INDEX, not per-element
    (measured scripts/gather_bench.py: a 16-row (R, C)[:, idx] gather
    costs the same ~15 ns/index as one column) — so the traversal's ~14
    separate column gathers per worklist slot were the round-2 rebuild
    wall (~210 ns/slot x 7.6M slots ~ 1.6 s at 1M bodies).  Pack the
    float attributes into one (R, C) f32 array — rows [com3, vel3, mass,
    (traceless Q6), (acc3)] — and the int attributes [count, body_start,
    child_start, child_count] into a separate (4, C) int32 array.  They
    must NOT share one array via bitcast: small int32 bit patterns are
    f32 DENORMALS, and the TPU flushes denormals to zero en route
    (measured round 3: a bitcast-transported traversal built 93%-wrong
    forces on chip while bit-exact on CPU).  The traceless conversion
    3*M2 - tr(M2)*I happens here once per CELL instead of per visited
    (group, cell) pair.
    """
    packed = []
    for lv in tree.levels:
        rows = [lv.com[0], lv.com[1], lv.com[2],
                lv.vel[0], lv.vel[1], lv.vel[2], lv.mass]
        if quadrupole:
            tr = lv.m2[0] + lv.m2[1] + lv.m2[2]
            rows += [3.0 * lv.m2[0] - tr, 3.0 * lv.m2[1] - tr,
                     3.0 * lv.m2[2] - tr, 3.0 * lv.m2[3],
                     3.0 * lv.m2[4], 3.0 * lv.m2[5]]
        if with_acc:
            rows += [lv.acc[0], lv.acc[1], lv.acc[2]]
        ints = jnp.stack([lv.count, lv.body_start, lv.child_start,
                          lv.child_count])
        packed.append((jnp.stack(rows), ints))
    return packed


def _pack_levels_geo(tree):
    """Single-table GEO packing for ranges/cellid (``emit_values=False``).

    Those modes never emit moment values during the traversal, so the
    only per-slot cell reads are GEOMETRY: com (acceptance test), count
    / body_start (covered-interval tests, sliver clipping), child_start
    / child_count (expansion).  Packing them into ONE f32 table — ints
    as exact 16-bit halves, CONVERTED not bitcast (small int32 patterns
    are f32 denormals and the TPU flushes them; 16-bit halves are
    integers <= 65535, exactly representable) — halves the traversal's
    per-slot gather count vs the (floats, ints) pair of
    :func:`_pack_levels` (~15 ns/index per gather regardless of row
    count, scripts/gather_bench.py).  child_count <= 8 rides a single
    row.  Rows: [com3, cnt_hi, cnt_lo, bs_hi, bs_lo, chs_hi, chs_lo,
    chc] = 10.  The overflow-residual fold re-gathers [mass, vel] from
    the level arrays inside its (rare) cond branch instead.
    """
    packed = []
    for lv in tree.levels:
        def hl(x):
            return [(x >> 16).astype(jnp.float32),
                    (x & 0xFFFF).astype(jnp.float32)]
        rows = ([lv.com[0], lv.com[1], lv.com[2]]
                + hl(lv.count) + hl(lv.body_start) + hl(lv.child_start)
                + [lv.child_count.astype(jnp.float32)])
        packed.append(jnp.stack(rows))
    return packed


class CompactEmits(NamedTuple):
    """Scatter-free traversal emissions (``emit_compact`` mode).

    ``ent``: (2, ΣE) int32 [start; end] body-range rows — per-level dense
    segments concatenated in level order (static offsets =
    :func:`_emit_offsets` of the worklist caps); within a level, entries
    are group-major and per-group runs keep worklist (Morton) order, so
    the entry sequence per group equals the scatter path's slot order
    exactly.  ``cnt``: (n_levels, ng) int32 per-level per-group counts.
    """

    ent: jax.Array
    cnt: jax.Array


def _emit_offsets(wl_caps):
    """Static level offsets into CompactEmits.ent (tile-rounded caps)."""
    offs = [0]
    for c in wl_caps:
        offs.append(offs[-1] + -(-int(c) // _COMPACT_TILE) * _COMPACT_TILE)
    return tuple(offs)


def _traverse_global(tree, bbox_min, bbox_max, ng, *, theta, soft_sq, skin,
                     gsz, intervals, list_cap, n_levels, wl_caps,
                     quadrupole=False, with_acc=False, with_ranges=True,
                     emit_values=True, emit_compact=False,
                     level_offsets=None, ablate=()):
    """Global-worklist traversal: all (group, cell) pairs of one level in
    one flat, group-major list.

    ``intervals``: (ng, M, 2) int32 half-open COVERED body ranges per
    group (:func:`_covered_intervals`) — the Morton window plus any
    near-neighbour groups, merged and sorted.  Cells wholly inside the
    union are dropped (their bodies are near-field sources); cells
    straddling it keep opening, and at max depth their uncovered
    fragments are emitted as range slivers.

    Unlike the per-group frontier (whose static capacity must cover the
    *densest* group, taxing every other group ~10x), the worklist's
    capacity bounds the TOTAL work per level — cost is proportional to
    actual visited pairs.  Group-major ordering is preserved through
    expansion, so per-group emission ranks fall out of one global
    cumulative sum plus segment bases.  Capacity overflow (global,
    generous) folds entries into a per-group mass-conserving residual
    monopole instead of dropping them.

    Memory-op budget per slot (the whole cost model — scripts/
    gather_bench.py): ONE packed attribute gather (~15 ns), ONE packed
    bounds gather, the emission value scatters (~5 ns/column) and the
    child-run reconstruction; everything else is vector math.

    ``emit_values=False`` (requires ``with_ranges`` and monopole layout)
    scatters ONLY the entry body ranges — 2 int32 columns instead of the
    7-10 value columns — and returns ``far=None``; the caller
    re-materializes every entry's moments from prefix sums over the
    sorted state (:func:`_finish_lists` dense path or
    :func:`_finish_pool_ranges` straight into the tile pool).  Cell
    moments ARE segment sums of the sorted arrays (cells are contiguous
    sorted runs), so the result is the same up to f32 association.
    Quadrupole layouts must emit values: the central second moment
    recovered from global-coordinate prefix sums (S₂ − M·com·comᵀ)
    cancels ~5 digits at world-scale offsets.

    ``ablate`` (measurement only — scripts/decide21.py): a set of phase
    names to REPLACE with cost-free stand-ins while keeping every array
    at its static capacity, so chained-marginal A/B isolates each
    phase's cost (the traversal is cap-proportional, so timings stay
    valid even though ablated results are numerically wrong).  Phases:
    "gather_cell", "gather_group", "emit", "sliver", "expand".

    Returns (far_vals (ng, R, L) | None, far_range, far_n, sl_start,
    sl_end, sl_n, res, wl_sizes).
    """
    if not emit_values:
        assert with_ranges and not quadrupole
    if emit_compact:
        assert not emit_values and with_ranges
    levels = tree.levels
    # GEO single-gather form for ranges/cellid; the classic (floats,
    # ints) pair only when moment values are emitted during traversal.
    geo = not emit_values
    if geo:
        geo_levels = _pack_levels_geo(tree)
        # [mass, vel3 (, acc3)] per level — gathered ONLY inside the
        # overflow-residual cond branch (rare), so the hot path pays a
        # single gather per slot.
        mv_levels = [jnp.stack([lv.mass, lv.vel[0], lv.vel[1], lv.vel[2]]
                               + ([lv.acc[0], lv.acc[1], lv.acc[2]]
                                  if with_acc else []))
                     for lv in levels]
        packed_levels = None
    else:
        packed_levels = _pack_levels(tree, quadrupole, with_acc)
    theta_sq = theta * theta
    L = list_cap
    n_cols = 7 + (6 if quadrupole else 0) + (3 if with_acc else 0)
    n_res = 10 if with_acc else 7
    M = intervals.shape[1]
    # Per-group packed data: (6, ng) f32 bounds and (2M, ng) int32
    # covered intervals (separate arrays — see the denormal note in
    # _pack_levels).
    bounds = jnp.concatenate([(bbox_min - skin).T, (bbox_max + skin).T])
    iv_pack = intervals.reshape(ng, 2 * M).T

    # Columnar storage throughout: (W,) and (ng*L,) flat vectors only.
    # Row-major (W, k) arrays tile as T(8,128) on TPU and pad the tiny
    # minor dimension up to 43x — both a memory and bandwidth disaster.
    far_cols = ([jnp.zeros((ng * L,), jnp.float32) for _ in range(n_cols)]
                if emit_values else None)
    # Entry body ranges (refresh machinery; skipped when the caller
    # can't use refreshes — e.g. the sharded engine).  Compact mode
    # collects per-level dense segments instead of (ng*L) slot arrays.
    # Cell-id mode (``level_offsets`` set) scatters ONE global-cell-id
    # column instead of the two range columns: every emitted entry IS a
    # tree cell, so its moments AND body range live in the (tight-cap,
    # hence small) per-level attribute tables and the finish re-reads
    # them with one packed gather per pool slot instead of compensated
    # prefix-sum segment math (:func:`_finish_pool_cellid`).  Unemitted
    # slots carry the reserved zero-column id.
    cellid = level_offsets is not None
    slots = with_ranges and not emit_compact
    if cellid:
        zid = level_offsets[-1] + ng * SLIVER_CAP
        fr_id = jnp.full((ng * L,), zid, jnp.int32)
        fr_s = fr_e = None
    else:
        fr_id = None
        fr_s = jnp.zeros((ng * L,), jnp.int32) if slots else None
        fr_e = jnp.zeros((ng * L,), jnp.int32) if slots else None
    ent_parts = []          # emit_compact: per-level (2, E_l) dense rows
    cnt_parts = []          # emit_compact: per-level (ng,) counts
    far_n = jnp.zeros((ng,), jnp.int32)
    sl_start = jnp.zeros((ng * SLIVER_CAP,), jnp.int32)
    sl_end = jnp.zeros((ng * SLIVER_CAP,), jnp.int32)
    sl_n = jnp.zeros((ng,), jnp.int32)
    # Residual accumulators: m, m*com, m*vel (+ m*acc) — flat (ng,) cols.
    res_cols = [jnp.zeros((ng,), jnp.float32) for _ in range(n_res)]

    # Init: every group x every start-level cell, group-major.  The
    # caller must size wl_caps[0] >= ng*c0 (c0 <= 64 at start level 2, so
    # this is cheap) — truncating here would silently drop whole octants
    # of mass from every group's far field.
    c0 = levels[0].code.shape[0]
    W0 = wl_caps[0]
    if W0 < ng * c0:
        raise ValueError(
            f"wl_caps[0]={W0} cannot hold the init frontier "
            f"ng*c0={ng}*{c0}; size the level-0 worklist to ng*c0")
    per_g = c0
    wl_g = jnp.repeat(jnp.arange(ng, dtype=jnp.int32), per_g)
    wl_c = jnp.tile(jnp.arange(per_g, dtype=jnp.int32), ng)
    wl_c = jnp.where(wl_c < levels[0].n_cells, wl_c, -1)
    pad_to = ng * per_g
    wl_n = jnp.int32(pad_to)
    if pad_to < W0:
        # Tail padding sorts AFTER every real group (keeps wl_g sorted
        # for the segment-base searchsorted).
        wl_g = jnp.pad(wl_g, (0, W0 - pad_to), constant_values=ng)
        wl_c = jnp.pad(wl_c, (0, W0 - pad_to), constant_values=-1)

    wl_sizes = [wl_n]
    wl_demand = [wl_n]
    for li in range(n_levels):
        lv = levels[li]
        level = tree.start_level + li
        side = 2.0 * tree.half / (2 ** level)
        last = li == n_levels - 1
        W = wl_g.shape[0]

        active = (jnp.arange(W) < wl_n) & (wl_c >= 0)
        cidx = jnp.clip(wl_c, 0, lv.code.shape[0] - 1)
        gidx = jnp.clip(wl_g, 0, ng - 1)

        # Packed (k, n)[:, idx] gathers are the fast form (18 ns/slot at
        # W=4M, scripts/decide19.py) — but XLA materializes their
        # [W, k] intermediate with the minor dim PADDED to 128 lanes,
        # and at the EXTREME worklist widths that padding is a single
        # >20 GB allocation ([40M, 6] killed the 20M and 50M runs at
        # compile).  Above this width the k separate flat gathers
        # (~2.5x the per-slot cost, zero padding) are the only form
        # that fits.
        unpadded = W > 8_000_000

        def pgather(rows2d, idx):
            if unpadded:
                return jnp.stack([rows2d[r][idx]
                                  for r in range(rows2d.shape[0])])
            return rows2d[:, idx]

        # ONE packed gather per slot for ranges/cellid (GEO table, ints
        # as exact 16-bit halves); the classic TWO (floats + ints) only
        # when the traversal emits moment values (see _pack_levels).
        def unhl(hi, lo):
            return (hi.astype(jnp.int32) << 16) | lo.astype(jnp.int32)

        if geo:
            if "gather_cell" in ablate:
                G = jnp.broadcast_to(geo_levels[li][:, :1], (10, W))
            else:
                G = pgather(geo_levels[li], cidx)     # (10, W) f32
            ccom = G[0:3]
            cvel = cmass = A = None
            ccount = jnp.where(active, unhl(G[3], G[4]), 0)
            cstart = jnp.where(active, unhl(G[5], G[6]), 0)
            child_start = unhl(G[7], G[8])
            child_count = G[9].astype(jnp.int32)
            vals = None
        else:
            if "gather_cell" in ablate:
                A = jnp.broadcast_to(packed_levels[li][0][:, :1],
                                     (packed_levels[li][0].shape[0], W))
                ci = jnp.broadcast_to(packed_levels[li][1][:, :1], (4, W))
            else:
                A = pgather(packed_levels[li][0], cidx)  # (n_cols, W) f32
                ci = pgather(packed_levels[li][1], cidx)  # (4, W) int32
            ccom = A[0:3]
            cvel = A[3:6]
            cmass = jnp.where(active, A[6], 0.0)
            ccount = jnp.where(active, ci[0], 0)
            cstart = jnp.where(active, ci[1], 0)
            child_start = ci[2]
            child_count = ci[3]
            # Columnar entry values [cx, cy, cz, vx, vy, vz, mass (, q6)
            # (, acc3)] are the packed rows themselves (mass re-gated to
            # 0 for inactive slots); the traceless quadrupole was
            # converted once per cell at pack time.
            vals = ((A[0], A[1], A[2], A[3], A[4], A[5], cmass)
                    + tuple(A[i] for i in range(7, n_cols)))
        cend = cstart + ccount

        if "gather_group" in ablate:
            B = jnp.broadcast_to(bounds[:, :1], (6, W))
            iv = jnp.broadcast_to(iv_pack[:, :1], (2 * M, W))
        else:
            B = pgather(bounds, gidx)              # (6, W)
            iv = pgather(iv_pack, gidx)            # (2M, W) int32
        gmin = B[0:3]
        gmax = B[3:6]

        # Covered-union tests in GLOBAL body indices.  Containment within
        # the union implies containment within a single interval (merged
        # intervals are disjoint with >= one uncovered group between
        # them), so M per-interval tests are exact.
        in_union = jnp.zeros((W,), bool)
        overlap = jnp.zeros((W,), bool)
        for i in range(M):
            lo_i, hi_i = iv[2 * i], iv[2 * i + 1]
            in_union |= (cstart >= lo_i) & (cend <= hi_i)
            overlap |= (cstart < hi_i) & (cend > lo_i)
        in_window = active & in_union
        straddle = active & ~in_union & overlap
        outside = active & ~in_union & ~overlap
        gap = jnp.maximum(gmin - ccom, ccom - gmax)
        gap = jnp.maximum(gap, 0.0)
        dmin_sq = jnp.sum(gap * gap, axis=0) + soft_sq
        theta_ok = side * side < theta_sq * dmin_sq

        # A multi-body cell with NO children is unopenable — normally
        # impossible before the last level, but occupancy-capped trees
        # (ops/octree.build_octree level_caps) produce them when a level
        # overflows (the merged-tail guard zeroes child_count).  Opening
        # one would expand into nothing and silently drop its mass.
        childless = child_count == 0
        emit_val = outside & (theta_ok | (ccount <= 1) | childless)
        emit_sl = straddle & ((ccount <= 1) | childless)
        if last:
            emit_val = emit_val | (outside & ~emit_val)
            emit_sl = emit_sl | (straddle & ~emit_sl)
            open_ = jnp.zeros_like(active)
        else:
            open_ = ((outside & ~emit_val) | (straddle & ~emit_sl)) \
                & (ccount > 1)

        # Per-group emission ranks from one global cumsum + segment bases
        # (wl_g is sorted, so each group's entries are one contiguous run).
        seg_all = jnp.searchsorted(
            wl_g, jnp.arange(ng + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        seg_start = seg_all[:ng]

        def fold_overflow(res_cols, over):
            # Entries past the per-group cap fold into the
            # mass-conserving residual; cond-gated by callers (rare).
            def add_residual(res_cols):
                res_idx = jnp.where(over, gidx, ng)
                if geo:
                    # GEO mode never gathered mass/vel on the hot path —
                    # re-gather them here, INSIDE the rare branch.
                    MV = pgather(mv_levels[li], cidx)
                    w = jnp.where(over & active, MV[0], 0.0)
                    contribs = (w, ccom[0] * w, ccom[1] * w, ccom[2] * w,
                                MV[1] * w, MV[2] * w, MV[3] * w)
                    if with_acc:
                        contribs = contribs + (MV[4] * w, MV[5] * w,
                                               MV[6] * w)
                else:
                    w = jnp.where(over, cmass, 0.0)
                    contribs = (w, ccom[0] * w, ccom[1] * w, ccom[2] * w,
                                cvel[0] * w, cvel[1] * w, cvel[2] * w)
                    if with_acc:
                        contribs = contribs + (A[n_cols - 3] * w,
                                               A[n_cols - 2] * w,
                                               A[n_cols - 1] * w)
                return [rc.at[res_idx].add(c, mode="drop")
                        for rc, c in zip(res_cols, contribs)]

            return jax.lax.cond(jnp.any(over), add_residual,
                                lambda rs: rs, res_cols)

        def gate_cap(mask, far_n):
            # Per-group cap gating: rank entries within their group via
            # one global cumsum + segment bases, keep local < L - 1.
            em = mask.astype(jnp.int32)
            excl = jnp.cumsum(em) - em
            base = excl[jnp.clip(seg_start, 0, W - 1)]       # (ng,)
            local = far_n[gidx] + (excl - base[gidx])
            ok = mask & (local < L - 1)
            return ok, local, mask & ~ok

        def scatter_emit(mask, far_cols, fr_s, fr_e, fr_id, far_n,
                         res_cols):
            ok, local, over = gate_cap(mask, far_n)
            flat = jnp.where(ok, gidx * L + local, ng * L)
            if emit_values:
                far_cols = [fc.at[flat].set(v, mode="drop")
                            for fc, v in zip(far_cols, vals)]
            if cellid:
                # One id column instead of the (start, end) pair; the
                # finish re-derives both moments and ranges from the
                # cell tables.
                fr_id = fr_id.at[flat].set(level_offsets[li] + cidx,
                                           mode="drop")
            elif with_ranges:
                fr_s = fr_s.at[flat].set(cstart, mode="drop")
                fr_e = fr_e.at[flat].set(cend, mode="drop")
            else:
                fr_s = fr_e = None
            res_cols = fold_overflow(res_cols, over)
            counts = jax.ops.segment_sum(ok.astype(jnp.int32), gidx,
                                         num_segments=ng)
            return (far_cols, fr_s, fr_e, fr_id,
                    jnp.minimum(far_n + counts, L - 1), res_cols)

        def compact_emit(mask, far_n, res_cols):
            # Scatter-free emission: within-tile compact + dense assembly
            # (the W-domain column scatters were the largest rebuild
            # phase — decide21_v2: +562 ms at 1M).
            ok, _local, over = gate_cap(mask, far_n)
            res_cols = fold_overflow(res_cols, over)
            oki = ok.astype(jnp.int32)
            okc = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(oki)])
            bounds_c = okc[jnp.clip(seg_all, 0, W)]
            counts = bounds_c[1:] - bounds_c[:-1]            # (ng,)
            E = _emit_offsets(wl_caps[li:li + 1])[1]
            pad = -(-W // _COMPACT_TILE) * _COMPACT_TILE - W
            okp = jnp.pad(ok, (0, pad))
            pays = (jnp.pad(cstart, (0, pad)), jnp.pad(cend, (0, pad)))
            method = "matmul" if emit_compact == "mm" else "sort"
            comp, tcnt = _tile_compact(okp, pays, method=method)
            ent, _tot = _tile_assemble(tcnt, comp, E)
            return ent, counts, jnp.minimum(far_n + counts, L - 1), \
                res_cols

        def scatter_sliver(mask, s, e, sl_state):
            # Straddling emissions are rare (~(2 + 2K) boundary cuts per
            # group per level), so COMPACT them first — the (M + 1)-part
            # clip against the covered intervals then runs on a small
            # array instead of repeating W-wide scatters per part.
            C = SL_COMPACT_PER_GROUP * ng

            def do(sl_state):
                sl_start, sl_end, sl_n = sl_state
                em = mask.astype(jnp.int32)
                rank = jnp.cumsum(em) - em
                cpos = jnp.where(mask, rank, C)       # overflow -> drop
                cs = jnp.zeros((C,), jnp.int32).at[cpos].set(s, mode="drop")
                ce = jnp.zeros((C,), jnp.int32).at[cpos].set(e, mode="drop")
                cg = jnp.full((C,), ng, jnp.int32).at[cpos].set(
                    gidx, mode="drop")
                cvalid = ce > cs
                cgc = jnp.clip(cg, 0, ng - 1)
                civ = intervals.reshape(ng, 2 * M).T[:, cgc]   # (2M, C)

                # Walk the sorted intervals with a running pointer: each
                # uncovered fragment of [cs, ce) becomes one sliver part.
                cur = cs
                parts = []
                for i in range(M):
                    lo_i, hi_i = civ[2 * i], civ[2 * i + 1]
                    parts.append((cur, jnp.minimum(ce, lo_i)))
                    cur = jnp.maximum(cur, hi_i)
                parts.append((cur, ce))

                cseg = jnp.searchsorted(
                    cg, jnp.arange(ng, dtype=jnp.int32),
                    side="left").astype(jnp.int32)
                for ps, pe in parts:
                    take = cvalid & (pe > ps)
                    tm = take.astype(jnp.int32)
                    excl = jnp.cumsum(tm) - tm
                    base = excl[jnp.clip(cseg, 0, C - 1)]
                    local = sl_n[cgc] + (excl - base[cgc])
                    ok = take & (local < SLIVER_CAP)
                    flat = jnp.where(ok, cgc * SLIVER_CAP + local,
                                     ng * SLIVER_CAP)
                    sl_start = sl_start.at[flat].set(ps, mode="drop")
                    sl_end = sl_end.at[flat].set(pe, mode="drop")
                    counts = jax.ops.segment_sum(ok.astype(jnp.int32),
                                                 jnp.where(take, cgc, ng),
                                                 num_segments=ng)
                    sl_n = jnp.minimum(sl_n + counts, SLIVER_CAP)
                return sl_start, sl_end, sl_n
            # Skip everything on the common no-straddle path.
            return jax.lax.cond(jnp.any(mask), do, lambda st: st, sl_state)

        if not last:
            W_next = wl_caps[li + 1]
            cc0 = jnp.where(open_, child_count, 0)
            base0 = jnp.cumsum(cc0) - cc0
            # Pre-clamp demand: what the next level WANTED.  demand >
            # cap means children were folded into coarse monopole
            # emissions at THIS level (and deeper demand is undercounted
            # — recalibrate iteratively, see calibrate_config).
            wl_demand.append(base0[-1] + cc0[-1])
            # Worklist overflow: whole entries degrade (values/slivers).
            ovf = open_ & (base0 + cc0 > W_next)
            emit_val = emit_val | (ovf & outside)
            emit_sl = emit_sl | (ovf & straddle)

        if "emit" in ablate:
            # Keep the acceptance mask alive without the rank cumsum /
            # column scatters / segment_sum.
            far_n = far_n + jnp.sum(emit_val.astype(jnp.int32))
        elif emit_compact:
            ent_l, cnt_l, far_n, res_cols = compact_emit(
                emit_val, far_n, res_cols)
            ent_parts.append(ent_l)
            cnt_parts.append(cnt_l)
        else:
            far_cols, fr_s, fr_e, fr_id, far_n, res_cols = scatter_emit(
                emit_val, far_cols, fr_s, fr_e, fr_id, far_n, res_cols)
        if "sliver" in ablate:
            sl_n = sl_n + jnp.sum(emit_sl.astype(jnp.int32))
        else:
            sl_start, sl_end, sl_n = scatter_sliver(
                emit_sl, cstart, cend, (sl_start, sl_end, sl_n))

        if not last and "expand" in ablate:
            # Cost-free synthetic next worklist at full capacity (keeps
            # a data dependence on the open set; wl_g stays sorted).
            slot = jnp.arange(W_next, dtype=jnp.int32)
            nc_next = levels[li + 1].code.shape[0]
            dep = jnp.minimum(jnp.sum(jnp.where(open_, cc0, 0)), 0)
            wl_c = (slot + dep) % nc_next
            wl_g = (slot * ng) // W_next
            wl_n = jnp.int32(W_next)
            wl_sizes.append(wl_n)
        elif not last:
            # Child expansion by RUN RECONSTRUCTION instead of per-child
            # scatter: children of an open cell are contiguous
            # (child_start .. +cc), so scatter one run descriptor per
            # parent (W updates x3) and rebuild the child list with a
            # cumsum + gathers over W_next — ~7W memory ops vs the 16W of
            # scattering every (cell, group) child individually.
            cc = jnp.where(ovf, 0, cc0)
            base = jnp.cumsum(cc) - cc                 # gapless offsets
            has = cc > 0
            ridx = jnp.cumsum(has.astype(jnp.int32)) - has
            rpos = jnp.where(has, ridx, W)
            cs = child_start
            run_cs = jnp.zeros((W,), jnp.int32).at[rpos].set(
                cs, mode="drop")
            run_g = jnp.full((W,), ng, jnp.int32).at[rpos].set(
                wl_g, mode="drop")
            run_base = jnp.zeros((W,), jnp.int32).at[rpos].set(
                base, mode="drop")
            # Run starts marked in the child domain; bases are distinct
            # (strictly increasing by cc >= 1 per open parent).
            mark = jnp.zeros((W_next,), jnp.int32).at[
                jnp.where(has, base, W_next)].set(1, mode="drop")
            seg = jnp.clip(jnp.cumsum(mark) - 1, 0, W - 1)
            slot = jnp.arange(W_next, dtype=jnp.int32)
            wl_n = base[-1] + cc[-1]
            live = slot < wl_n
            if W_next > 8_000_000:
                R3 = jnp.stack([run_cs[seg], run_g[seg], run_base[seg]])
            else:
                runs = jnp.stack([run_cs, run_g, run_base])
                R3 = runs[:, seg]                      # one packed gather
            wl_c = jnp.where(live, R3[0] + (slot - R3[2]), -1)
            wl_g = jnp.where(live, R3[1], ng)
            wl_sizes.append(wl_n)

    # Assemble the (ng, R, L) eval tensor (entries on the minor/lane dim).
    # Rows are exactly the emitted columns (see far_layout): 8 plain
    # monopole (one pad row), 10 with acc, 13 with quadrupole, 16 both —
    # no zero-filled placeholder segments.
    if emit_values:
        grid = [fc.reshape(ng, L) for fc in far_cols]
        if n_cols == 7:
            grid.append(jnp.zeros((ng, L), jnp.float32))
        far = jnp.stack(grid, axis=1)                         # (ng, R, L)
    else:
        far = None
    if emit_compact:
        far_range = (CompactEmits(ent=jnp.concatenate(ent_parts, axis=1),
                                  cnt=jnp.stack(cnt_parts))
                     if ent_parts else None)
    elif cellid:
        far_range = fr_id.reshape(ng, L)
    else:
        far_range = (jnp.stack([fr_s.reshape(ng, L), fr_e.reshape(ng, L)],
                               axis=1)                        # (ng, 2, L)
                     if with_ranges else None)
    res = jnp.stack(res_cols, axis=1)                         # (ng, 7|10)
    # Stacked [fills (n_levels) | pre-clamp demands (n_levels)]: a
    # demand > the level's static cap means coarse folding occurred.
    return (far, far_range, far_n, sl_start.reshape(ng, SLIVER_CAP),
            sl_end.reshape(ng, SLIVER_CAP), sl_n, res,
            jnp.stack(wl_sizes + wl_demand))


def _device_hbm_bytes(default: float = 13.0e9) -> float:
    """Usable HBM of the default device, from the runtime when it says.

    ``memory_stats()['bytes_limit']`` is authoritative where available
    (so a 95 GB v5p is not clamped to a v5e-sized budget and a smaller
    part is not oversubscribed); some backends (this image's tunneled
    v5e included) report nothing — then ``default`` (a measured-safe
    v5e figure) is used.
    """
    try:
        dev = jax.local_devices()[0]
        stats = dev.memory_stats() if hasattr(dev, "memory_stats") else None
        if stats:
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit")
            if limit:
                return float(limit)
    except Exception:  # pragma: no cover - backend-specific
        pass
    return float(default)


def _auto_budget(npad: int) -> int:
    """Auto worklist budget: 4.2 visited pairs per body, capped.

    The cap is 6M up to 4.2M bodies and 10M beyond: the 10M Plummer
    cluster's second-deepest level demands 8.85M pairs, and saturating it
    (budget 6M) folds near-core mass coarsely enough to push the median
    force error to 13.6% (vs ~0.4% unfolded); a 14M budget runs out of
    HBM in the full step.  At 10M only the FINAL level folds, which is
    the gentle case (measured 2026-08-17, scripts/nbody_error.py).
    """
    budget = max(262_144, int(4.2 * npad))
    # 20.5M, not 20M: the 20M EXTREME preset PADS to 20,000,768 slots
    # (group multiples), and crossing into the 40M branch at exactly the
    # advertised scale made the traversal's [W, 6] gather intermediate
    # (whose minor dim pads to 128 lanes on TPU, 21x) a 20.5 GB
    # compile-time allocation failure (docs/measurements_r4/
    # extreme_20m.log).
    # The >20.5M branch was 40M through round 4's first 50M attempts —
    # the deepest level then carries a 40M-slot live set (~30 gathered
    # columns) and BOTH 50M runs died ResourceExhausted after the first
    # build (extreme_50m_v3/v5.log).  24M fits; the overflow folds at
    # the FINAL level only, the measured-gentle case.
    cap = (6_000_000 if npad <= 4_200_000 else
           10_000_000 if npad <= 20_500_000 else 24_000_000)
    return min(budget, cap)


def _default_wl_caps(ng: int, n_levels: int, budget: int, c0: int = 64):
    """Per-level worklist capacities.

    The traversal's cost is proportional to these STATIC caps (every
    per-level pass processes the whole cap-sized vector), not to the
    worklist's actual fill — so the caps are sized to the measured demand
    profile plus ~25-30% headroom, and density drift beyond that folds
    into bounded-error residual monopoles rather than growing the caps.
    Measured at 1M galaxy θ=0.8, skin 2 (build_diagnostics): demand
    [250K, 263K, 210K, 244K, 601K, 1250K, 3214K] against a 4.2M budget.
    Level 0 must hold the full ``ng * c0`` init frontier (c0 =
    start-level cell count, <= 64) — anything smaller silently truncates
    every group's far field.
    """
    frac = [0.07, 0.07, 0.06, 0.07, 0.17, 0.36] + [1.0] * max(
        0, n_levels - 6)
    caps = []
    for li in range(n_levels):
        f = frac[li] if li < len(frac) else 1.0
        caps.append(int(max(ng * 8, f * budget)))
    caps[0] = max(caps[0], ng * c0)
    return tuple(caps)


@functools.partial(
    jax.jit,
    static_argnames=("theta", "softening", "skin", "max_depth", "group_size",
                     "window_groups", "list_cap", "worklist_budget",
                     "n_groups", "quadrupole", "near_groups",
                     "with_ranges", "pool_tile", "pool_cap", "emit_mode",
                     "wl_caps", "tree_caps", "ablate"))
def build_lists(pos, vel, mass, acc=None, *, theta, softening, skin=4.0,
                max_depth=10, group_size=256, window_groups=3, list_cap=2048,
                worklist_budget=0, group_offset=0, n_groups=None,
                quadrupole=False, near_groups=0, with_ranges=True,
                pool_tile=0, pool_cap=0, emit_mode="auto", wl_caps=(),
                tree_caps=(), ablate=()):
    """Morton-sort + octree + global-worklist traversal -> :class:`BHLists`.

    The traversal visits all (group, cell) pairs of one octree level in a
    single flat worklist, so its cost is proportional to the pairs
    actually visited (robust to skewed densities; see _traverse_global).
    A per-group static-frontier variant and a two-phase supergroup layout
    were studied in round 1 and removed — both lost to the global
    worklist on dense cores.

    ``group_offset`` (traced) + ``n_groups`` (static) restrict the
    traversal and the returned lists to a contiguous group range — the
    multi-chip path hands each device its shard of groups while the
    (cheap) sort + octree stay replicated.
    """
    n = pos.shape[1]
    gsz = group_size
    half = compute_bounds(pos)
    codes = morton_encode(pos, half, max_depth)
    order = jnp.argsort(codes).astype(jnp.int32)

    npad = ((n + gsz - 1) // gsz) * gsz
    pad = npad - n
    order_pad = jnp.concatenate(
        [order, jnp.broadcast_to(order[-1], (pad,))])
    s_codes = jnp.concatenate(
        [codes[order], jnp.broadcast_to(codes[order[-1]], (pad,))])
    s_pos = pos[:, order_pad]
    pad_mask = jnp.arange(npad) >= n
    s_mass = jnp.where(pad_mask, 0.0, mass[order_pad])
    s_vel = vel[:, order_pad]
    s_acc = None if acc is None else acc[:, order_pad]

    return _build_from_sorted(
        s_codes, s_pos, s_vel, s_mass, s_acc, order, order_pad, pos, n,
        half, theta=theta, softening=softening, skin=skin,
        max_depth=max_depth, group_size=group_size,
        window_groups=window_groups, list_cap=list_cap,
        worklist_budget=worklist_budget, group_offset=group_offset,
        n_groups=n_groups, quadrupole=quadrupole,
        near_groups=near_groups, with_ranges=with_ranges,
        pool_tile=pool_tile, pool_cap=pool_cap, emit_mode=emit_mode,
        wl_caps=wl_caps, tree_caps=tree_caps, ablate=ablate)


@functools.partial(
    jax.jit,
    static_argnames=("theta", "softening", "skin", "max_depth",
                     "group_size", "window_groups", "list_cap",
                     "worklist_budget", "n_groups", "quadrupole",
                     "near_groups", "with_ranges", "pool_tile", "pool_cap",
                     "emit_mode", "wl_caps", "tree_caps"))
def build_lists_sorted(s_pos, s_vel, s_mass, s_acc=None, *, order, theta,
                       softening, skin=4.0, max_depth=10, group_size=256,
                       window_groups=3, list_cap=2048, worklist_budget=0,
                       group_offset=0, n_groups=None, quadrupole=False,
                       near_groups=0, with_ranges=True, pool_tile=0,
                       pool_cap=0, emit_mode="auto", wl_caps=(),
                       tree_caps=()):
    """:func:`build_lists` for ALREADY globally Morton-sorted state.

    Entry point for the distributed rebuild
    (:mod:`spatialsim_tpu.parallel.distsort` sample-sorts the shards;
    the devices then gather the SORTED state and skip the replicated
    ``argsort(N)``).  ``s_pos``/``s_vel``/``s_mass`` must be
    (3, npad)/(npad,) with npad a multiple of ``group_size`` and padding
    slots already zero-mass; ``order`` is the (npad,) caller-meaningful
    id of each sorted slot, threaded through to ``BHLists.order``.
    """
    npad = s_pos.shape[1]
    assert npad % group_size == 0, "pre-sorted input must be group-padded"
    half = compute_bounds(s_pos)
    s_codes = morton_encode(s_pos, half, max_depth)
    return _build_from_sorted(
        s_codes, s_pos, s_vel, s_mass, s_acc, order, order, s_pos, npad,
        half, theta=theta, softening=softening, skin=skin,
        max_depth=max_depth, group_size=group_size,
        window_groups=window_groups, list_cap=list_cap,
        worklist_budget=worklist_budget, group_offset=group_offset,
        n_groups=n_groups, quadrupole=quadrupole,
        near_groups=near_groups, with_ranges=with_ranges,
        pool_tile=pool_tile, pool_cap=pool_cap, emit_mode=emit_mode,
        wl_caps=wl_caps, tree_caps=tree_caps)


def _build_from_sorted(s_codes, s_pos, s_vel, s_mass, s_acc, order,
                       order_pad, pos, n, half, *, theta, softening, skin,
                       max_depth, group_size, window_groups, list_cap,
                       worklist_budget, group_offset, n_groups,
                       quadrupole, near_groups, with_ranges, pool_tile,
                       pool_cap=0, emit_mode="auto", wl_caps=(),
                       tree_caps=(), ablate=()):
    gsz = group_size
    npad = s_pos.shape[1]
    acc = s_acc

    tree = build_octree(s_codes, s_pos, s_mass, half, max_depth=max_depth,
                        start_level=2, n=npad, sorted_vel=s_vel,
                        sorted_acc=s_acc, with_quadrupole=quadrupole,
                        level_caps=tuple(tree_caps or ()))
    n_levels = len(tree.levels)

    ng_total = npad // gsz
    ng = n_groups or ng_total
    gpos = s_pos.reshape(3, ng_total, gsz)
    bmin_all = jnp.min(gpos, axis=2).T                        # (ng_total, 3)
    bmax_all = jnp.max(gpos, axis=2).T
    sliced = ng != ng_total or not (
        isinstance(group_offset, int) and group_offset == 0)
    if sliced:
        bbox_min = jax.lax.dynamic_slice_in_dim(bmin_all, group_offset, ng)
        bbox_max = jax.lax.dynamic_slice_in_dim(bmax_all, group_offset, ng)
    else:
        bbox_min, bbox_max = bmin_all, bmax_all

    if near_groups > 0:
        near = _select_near_groups(bmin_all, bmax_all, near_groups,
                                   window_groups, group_offset, ng)
    else:
        near = jnp.zeros((ng, 0), jnp.int32)
    intervals = _covered_intervals(near, window_groups, group_offset, gsz)

    budget = worklist_budget or _auto_budget(npad)
    c0 = tree.levels[0].code.shape[0]
    explicit_caps = bool(wl_caps)
    if wl_caps:
        assert len(wl_caps) == n_levels, (
            f"wl_caps has {len(wl_caps)} levels, build has {n_levels} "
            f"(depth change invalidates calibrated caps)")
        wl_caps = tuple(max(int(c), ng * (c0 if li == 0 else 8))
                        for li, c in enumerate(wl_caps))
    else:
        wl_caps = _default_wl_caps(ng, n_levels, budget, c0=c0)
    # Ranges-only emission: 2 int32 scatter columns per level instead of
    # 9-12, moments re-materialized from prefix sums at finish.  "auto"
    # enables it exactly where it pays structurally — the pooled path,
    # where moments then materialize STRAIGHT into the pool and the
    # dense (ng, R, L) transient never exists (required at EXTREME
    # scale).  Quadrupole and rangeless (sharded) builds must emit
    # values (see _traverse_global).
    # (A sequential in-VMEM Pallas DFS traversal — emit_mode "kernel" —
    # was built and measured in rounds 3-4: 3,077 ms vs the XLA path's
    # 1,757 ms at 1M AND a 7/256-group range-set divergence on real TPU
    # that interpret-mode tests could not see (decide17_1m.log).  Deleted
    # in round 5 per the fix-or-delete bar; the scatter-free compact
    # emission above is the surviving successor.)
    compact_mode = (emit_mode in ("compact", "compact-mm") and with_ranges
                    and not quadrupole and bool(pool_tile))
    # auto -> cellid when the pool is on: on-chip A/B at 1M showed the
    # cell-table finish beats the prefix-sum ranges finish (rebuild 1664
    # -> 1401 ms, identical checksums — decide27_geo.log).
    cellid_mode = (emit_mode in ("cellid", "auto") and with_ranges
                   and not quadrupole and bool(pool_tile))
    emit_ranges = (with_ranges and not quadrupole
                   and (emit_mode == "ranges"
                        or (emit_mode == "auto" and bool(pool_tile))
                        or compact_mode or cellid_mode))
    level_offs = None
    if cellid_mode:
        offs, tot = [], 0
        for lv in tree.levels:
            offs.append(tot)
            tot += lv.code.shape[0]
        level_offs = tuple(offs + [tot])
    far, far_range, far_n, sl_start, sl_end, sl_n, res, _wl = \
        _traverse_global(
            tree, bbox_min, bbox_max, ng, theta=float(theta),
            soft_sq=float(softening) ** 2, skin=float(skin), gsz=gsz,
            intervals=intervals, list_cap=list_cap,
            n_levels=n_levels, wl_caps=wl_caps,
            quadrupole=quadrupole, with_acc=acc is not None,
            with_ranges=with_ranges, emit_values=not emit_ranges,
            emit_compact=(("mm" if emit_mode == "compact-mm" else True)
                          if compact_mode else False),
            level_offsets=level_offs, ablate=tuple(
                a for a in ablate if a != "finish"))
    if "finish" in ablate:
        # Measurement-only stand-in (scripts/decide27.py): same output
        # structure and static shapes as the pooled finish, with a live
        # data dependence on every traversal output so nothing upstream
        # is DCE'd, but none of the finish's gather/prefix machinery.
        assert pool_tile and emit_ranges and not compact_mode
        cap = pool_cap or pool_cap_tiles(budget, ng, pool_tile, npad,
                             caps_total=sum(wl_caps) if explicit_caps else 0)
        probe = (jnp.sum(far_range.astype(jnp.float32)) * 1e-30
                 + jnp.sum(far_n).astype(jnp.float32)
                 + jnp.sum(sl_start + sl_end).astype(jnp.float32) * 1e-30
                 + jnp.sum(sl_n).astype(jnp.float32) * 1e-30
                 + jnp.sum(res) * 1e-30)
        pool = jnp.zeros((cap, POOL_ROWS, pool_tile), jnp.float32) + probe
        pstart = jnp.arange(ng, dtype=jnp.int32)
        inv_order = jnp.zeros((n,), jnp.int32)
        return BHLists(order=order_pad, inv_order=inv_order, far=None,
                       far_n=far_n, ref_pos=pos, steps_since=jnp.int32(0),
                       near=near, far_range=None, steps_build=jnp.int32(0),
                       pool=pool, pstart=pstart)
    if cellid_mode:
        cap = pool_cap or pool_cap_tiles(budget, ng, pool_tile, npad,
                             caps_total=sum(wl_caps) if explicit_caps else 0)
        return _finish_pool_cellid(
            tree, level_offs, far_range, far_n, sl_start, sl_end, sl_n,
            res, s_pos, s_vel, s_mass, order, order_pad, pos, n, list_cap,
            tile=pool_tile, cap_tiles=cap, s_acc=s_acc, near=near)
    if compact_mode:
        cap = pool_cap or pool_cap_tiles(budget, ng, pool_tile, npad,
                             caps_total=sum(wl_caps) if explicit_caps else 0)
        return _finish_pool_compact(
            far_range, far_n, sl_start, sl_end, sl_n, res,
            s_pos, s_vel, s_mass, order, order_pad, pos, n, list_cap,
            tile=pool_tile, cap_tiles=cap,
            emit_offsets=_emit_offsets(wl_caps), s_acc=s_acc, near=near)
    if pool_tile and emit_ranges:
        cap = pool_cap or pool_cap_tiles(budget, ng, pool_tile, npad,
                             caps_total=sum(wl_caps) if explicit_caps else 0)
        return _finish_pool_ranges(
            far_range, far_n, sl_start, sl_end, sl_n, res,
            s_pos, s_vel, s_mass, order, order_pad, pos, n, list_cap,
            tile=pool_tile, cap_tiles=cap, s_acc=s_acc, near=near)
    lists = _finish_lists(far, far_range, far_n, sl_start, sl_end,
                          sl_n, res, s_pos, s_vel,
                          s_mass, order, order_pad, pos, n, list_cap,
                          s_acc=s_acc, near=near)
    if pool_tile:
        assert not quadrupole, "pool layout is monopole-only"
        cap = pool_cap or pool_cap_tiles(budget, ng, pool_tile, npad,
                             caps_total=sum(wl_caps) if explicit_caps else 0)
        pool, pstart, far_n2 = build_pool(lists.far, lists.far_range,
                                          lists.far_n, tile=pool_tile,
                                          cap_tiles=cap)
        lists = lists._replace(pool=pool, pstart=pstart, far_n=far_n2,
                               far=None, far_range=None)
    return lists


def _finish_lists(far, far_range, far_n, sl_start, sl_end, sl_n, res,
                  s_pos, s_vel, s_mass, order, order_pad,
                  pos, n, list_cap, s_acc=None, near=None):
    """Sliver moments + residual entry + BHLists assembly.

    ``far`` uses the (groups, R, entries) layout with R per
    :func:`far_layout` (8/10/13/16).  Slivers and the residual stay
    monopole in Q (mass-conserving fallbacks) but do carry mean
    velocity/acceleration so they advance like other entries.

    ``far=None`` (the traversal ran ranges-only, ``emit_values=False``):
    every entry's monopole moments are re-materialized here from the
    prefix sums — segment sums over ``far_range`` — before the sliver /
    residual machinery runs unchanged.
    """
    ng = far_n.shape[0]
    with_acc = s_acc is not None
    n_rows = far.shape[1] if far is not None else (10 if with_acc else 8)
    quad, acc0 = far_layout(n_rows)

    # Sliver moments (window-boundary fragments) from prefix sums; tiny
    # gather (ng x SLIVER_CAP x 2 x rows).
    w = s_mass[None, :]
    cols = [s_mass[None, :], s_pos * w, s_vel * w]
    if with_acc:
        cols.append(s_acc * w)
    pref = _comp_prefix(jnp.concatenate(cols, axis=0))   # (2P, npad+1)

    if far is None:
        L = list_cap
        # Materialize in group chunks: the flat (P, ng*L) segment sums,
        # their stacked rows, AND the transposed dense tensor would
        # otherwise coexist (~9 GB at the 50M shape — the round-4 50M
        # OOM); per-chunk temps are bounded and only the (ng, R, L)
        # output is ever whole.
        CHG = max(1, _COMP_SEG_CHUNK // L)
        ngp = -(-ng // CHG) * CHG
        frp = (jnp.pad(far_range, ((0, ngp - ng), (0, 0), (0, 0)))
               if ngp != ng else far_range)

        def _chunk(fr_c):                            # (CHG, 2, L)
            fs = fr_c[:, 0, :].reshape(CHG * L)
            fe = fr_c[:, 1, :].reshape(CHG * L)
            segf = _comp_seg(pref, fs, fe)           # (P, CHG*L)
            fm = segf[0]
            finv = jnp.where(fm > 0, 1.0 / jnp.maximum(fm, 1e-30), 0.0)
            frows = [segf[1] * finv, segf[2] * finv, segf[3] * finv,
                     segf[4] * finv, segf[5] * finv, segf[6] * finv, fm]
            if with_acc:
                frows += [segf[7] * finv, segf[8] * finv, segf[9] * finv]
            frows += [jnp.zeros((CHG * L,), jnp.float32)] * (
                n_rows - len(frows))
            return jnp.stack(frows).reshape(
                n_rows, CHG, L).transpose(1, 0, 2)   # (CHG, R, L)

        far = jax.lax.map(
            _chunk, frp.reshape(ngp // CHG, CHG, 2, L)).reshape(
                ngp, n_rows, L)[:ng]

    seg = _comp_seg(pref, sl_start, sl_end)              # (P, ng, SC)
    svalid = (jnp.arange(SLIVER_CAP)[None, :] < sl_n[:, None])
    sm = jnp.where(svalid, seg[0], 0.0)
    sinv = jnp.where(sm > 0, 1.0 / jnp.maximum(sm, 1e-30), 0.0)
    srows = [seg[1] * sinv, seg[2] * sinv, seg[3] * sinv,
             seg[4] * sinv, seg[5] * sinv, seg[6] * sinv, sm]
    if quad:
        srows += [jnp.zeros_like(sm)] * 6                # q rows
    if acc0 is not None:
        srows += ([seg[7] * sinv, seg[8] * sinv, seg[9] * sinv]
                  if with_acc else [jnp.zeros_like(sm)] * 3)
    srows += [jnp.zeros_like(sm)] * (n_rows - len(srows))  # pad row (R=8)
    svals = jnp.stack(srows, axis=1)                     # (ng, R, SC)

    # Append slivers to the far lists (slot list_cap-1 stays reserved for
    # the residual; sliver overflow folds into the residual too).
    with_ranges = far_range is not None

    def append(fv, fr, fn, sv, ss_, se_, sn, rs):
        # fv (R, L); fr (2, L)|(); sv (R, SC); ss_/se_ (SC,); rs (7|10,)
        k = jnp.arange(SLIVER_CAP, dtype=jnp.int32)
        take = k < sn
        fits = take & (fn + k < list_cap - 1)
        slot = jnp.where(fits, fn + k, list_cap)
        fv = fv.at[:, slot].set(sv, mode="drop")
        if with_ranges:
            fr = fr.at[:, slot].set(jnp.stack([ss_, se_]), mode="drop")
        over = take & ~fits
        om = jnp.where(over, sv[6, :], 0.0)
        parts = [jnp.sum(om)[None],
                 jnp.sum(sv[0:3, :] * om[None, :], axis=1),
                 jnp.sum(sv[3:6, :] * om[None, :], axis=1)]
        if with_acc:
            parts.append(jnp.sum(sv[acc0:acc0 + 3, :] * om[None, :],
                                 axis=1))
        rs = rs + jnp.concatenate(parts)
        return fv, fr, jnp.minimum(fn + sn, list_cap - 1), rs

    fr_in = far_range if with_ranges else jnp.zeros((ng, 1))
    far, far_range, far_n, res = jax.vmap(append)(
        far, fr_in, far_n, svals, sl_start, sl_end, sl_n, res)
    if not with_ranges:
        far_range = None

    # Residual -> one entry in the reserved last slot.
    res_m = res[:, 0]
    has_res = res_m > 0
    inv_m = jnp.where(has_res, 1.0 / jnp.maximum(res_m, 1e-30), 0.0)
    rparts = [res[:, 1:4] * inv_m[:, None], res[:, 4:7] * inv_m[:, None],
              res_m[:, None]]
    if quad:
        rparts.append(jnp.zeros((ng, 6), jnp.float32))   # q rows
    if acc0 is not None:
        rparts.append(res[:, 7:10] * inv_m[:, None] if with_acc
                      else jnp.zeros((ng, 3), jnp.float32))
    done = sum(part.shape[1] for part in rparts)
    if done < n_rows:
        rparts.append(jnp.zeros((ng, n_rows - done), jnp.float32))
    res_entry = jnp.concatenate(rparts, axis=1)                 # (ng, R)
    # APPEND the residual right after the real entries (round 2 parked
    # it at the fixed last slot and bumped far_n to L, making every
    # overflow group pay a full-L eval and blocking tight pool
    # compaction).
    slot = jnp.minimum(far_n, list_cap - 1)
    gi_ = jnp.arange(ng)[:, None]
    ri_ = jnp.arange(n_rows)[None, :]
    far = far.at[gi_, ri_, slot[:, None]].set(
        jnp.where(has_res[:, None], res_entry, far[gi_, ri_,
                                                   slot[:, None]]))
    if far_range is not None:
        ri2 = jnp.arange(2)[None, :]
        far_range = far_range.at[gi_, ri2, slot[:, None]].set(
            jnp.where(has_res[:, None], 0,
                      far_range[gi_, ri2, slot[:, None]]))
    far_n = jnp.minimum(far_n + has_res.astype(jnp.int32), list_cap)

    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    if near is None:
        near = jnp.zeros((ng, 0), jnp.int32)
    return BHLists(order=order_pad, inv_order=inv_order,
                   far=far.astype(jnp.float32), far_n=far_n,
                   ref_pos=pos, steps_since=jnp.int32(0), near=near,
                   far_range=far_range, steps_build=jnp.int32(0))


POOL_ROWS = 16


def pool_cap_tiles(budget: int, ng: int, tile: int, npad: int = 0,
                   caps_total: int = 0) -> int:
    """Static tile capacity sized to measured emission totals.

    Round 3 claimed emissions <= the worklist budget ("one per visited
    slot") — FALSE: slots across ALL levels can emit, and the measured
    1M total is ~1.3x the budget (10605 of 12608 tiles used,
    docs/measurements_r4/decide14_pool.log), saved only by the margin
    terms.  Above 4M bodies the per-level caps (and therefore possible
    emissions) are several budget multiples, so the budget term scales
    2.5x there; a cumulative overflow beyond the static cap is handled
    GRACEFULLY (whole-group fold into the mass-conserving residual,
    :func:`_finish_pool_ranges`) instead of the out-of-bounds pool DMA
    that killed the first 20M run.

    ``caps_total`` (the explicit per-level cap sum, when calibrated
    caps are in use) is the EXACT emission bound — every worklist slot
    emits at most one entry — and replaces the budget heuristic.
    Without it, a calibrated build's extra emissions silently folded
    whole core groups into residual monopoles (rms 1091 on the 100K
    cluster, round 4).
    """
    if caps_total:
        return int(caps_total + ng * (SLIVER_CAP + 1)) // tile + ng + 1
    factor = 1 if (npad or 0) <= 4_200_000 else 2.5
    return int(factor * budget + ng * (SLIVER_CAP + 1)) // tile + ng + 1


def build_pool(far, far_range, far_n, *, tile, cap_tiles):
    """Compact dense (ng, R, L) far lists into the tile pool.

    One packed gather (XLA random-access cost is per-INDEX — a 14-row
    packed gather costs the same as one column, scripts/gather_bench.py)
    re-materializes every real entry; slots past ``far_n`` and tiles
    past the group's count read a zero column, so padding entries carry
    zero mass.  Entry body-ranges ship as exact 16-bit float halves
    (rows 10-13) — int32 must NOT ride f32 bitcasts on TPU (denormal
    flush), and f32 can't hold 31-bit indices directly.
    """
    ng, R, L = far.shape
    assert R in (8, 10), "pool layout is monopole-only"

    # Cumulative-capacity guard (same contract as _finish_pool_ranges):
    # a group whose tiles would start past the cap folds its WHOLE far
    # list into one mass-conserving residual entry instead of laying
    # out-of-bounds tiles for the eval kernel's DMA to chase.
    tiles_try = (far_n + tile - 1) // tile
    start_try = jnp.cumsum(tiles_try) - tiles_try
    unfit = start_try + tiles_try > cap_tiles - ng

    def fold_groups(args):
        far, far_n = args
        k = jnp.arange(L, dtype=jnp.int32)[None, :]
        em = jnp.where((k < far_n[:, None]) & unfit[:, None], 1.0, 0.0)
        w = far[:, 6, :] * em                       # entry masses
        m = jnp.sum(w, axis=1)
        inv = jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-30), 0.0)
        fold = [jnp.sum(far[:, i, :] * w, axis=1) * inv
                for i in range(R) if i != 6]
        fold.insert(6, m)
        entry0 = jnp.stack(fold, axis=1)            # (ng, R)
        far = jnp.where(
            unfit[:, None, None],
            jnp.zeros_like(far).at[:, :, 0].set(entry0), far)
        return far, jnp.where(unfit, 1, far_n)

    far, far_n = jax.lax.cond(jnp.any(unfit), fold_groups,
                              lambda a: a, (far, far_n))
    if far_range is not None:
        far_range = jnp.where(unfit[:, None, None], 0, far_range)

    tiles_g = (far_n + tile - 1) // tile
    pstart = (jnp.cumsum(tiles_g) - tiles_g).astype(jnp.int32)

    t_idx = jnp.arange(cap_tiles, dtype=jnp.int32)
    g_of = (jnp.searchsorted(pstart, t_idx, side="right") - 1).astype(
        jnp.int32)
    g_c = jnp.clip(g_of, 0, ng - 1)
    k_of = t_idx - pstart[g_c]
    ent = k_of[:, None] * tile + jnp.arange(tile, dtype=jnp.int32)[None]
    valid = ((t_idx < jnp.sum(tiles_g))[:, None]
             & (ent < far_n[g_c][:, None]) & (ent < L))
    idx = jnp.where(valid, g_c[:, None] * L + jnp.minimum(ent, L - 1),
                    ng * L).reshape(-1)

    farf = far.transpose(1, 0, 2).reshape(R, ng * L)
    zero = jnp.zeros((ng * L,), jnp.float32)
    rows = [farf[i] for i in range(7)]
    rows += ([farf[7 + i] for i in range(3)] if R == 10
             else [zero] * 3)
    if far_range is not None:
        fs = far_range[:, 0, :].reshape(ng * L)
        fe = far_range[:, 1, :].reshape(ng * L)
    else:
        fs = fe = jnp.zeros((ng * L,), jnp.int32)
    rows += [(fs >> 16).astype(jnp.float32),
             (fs & 0xFFFF).astype(jnp.float32),
             (fe >> 16).astype(jnp.float32),
             (fe & 0xFFFF).astype(jnp.float32)]
    src = jnp.pad(jnp.stack(rows), ((0, 0), (0, 1)))     # (14, ngL+1)
    vals = src[:, idx]                                    # ONE gather
    vals = jnp.concatenate(
        [vals, jnp.zeros((POOL_ROWS - 14, vals.shape[1]), jnp.float32)])
    pool = vals.reshape(POOL_ROWS, cap_tiles, tile).transpose(1, 0, 2)
    # far_n must ship back: capacity folds shrink a group's list to one
    # residual entry, and the eval's tile count is ceil(far_n / tile).
    return pool, pstart, far_n


def _pool_ranges(pool):
    """Decode (fs, fe) int32 body ranges from pool rows 10-13."""
    ct, _, tile = pool.shape
    flat = pool.transpose(1, 0, 2).reshape(POOL_ROWS, ct * tile)
    fs = (flat[10].astype(jnp.int32) << 16) | flat[11].astype(jnp.int32)
    fe = (flat[12].astype(jnp.int32) << 16) | flat[13].astype(jnp.int32)
    return fs, fe


def _finish_pool_ranges(far_range, far_n, sl_start, sl_end, sl_n, res,
                        s_pos, s_vel, s_mass, order, order_pad, pos, n,
                        list_cap, *, tile, cap_tiles, s_acc=None,
                        near=None):
    """Ranges-only finish: slivers + residual + moments STRAIGHT into the
    tile pool — the dense ``(ng, R, L)`` tensor never exists.

    This is what makes the pool viable at EXTREME scale: at 50M bodies
    the dense monopole transient is ~16 GB (195K groups x 10 rows x 2048
    cap x 4 B) while the range columns + pool are ~6 GB.  The traversal
    ran with ``emit_values=False``; every real entry's monopole moments
    are segment sums of the sorted state over its ``[start, end)`` range
    (the same identity :func:`refresh_lists` uses every refresh).
    Slivers ARE ranges, so they append as ordinary entries; only the
    mass-conserving residual (no contiguous range) carries stored
    values, scattered into its reserved slot after pool assembly.
    """
    ng = far_n.shape[0]
    L = list_cap
    npad = s_pos.shape[1]
    with_acc = s_acc is not None

    # Prefix sums: [m, m*pos, m*vel (, m*acc)] over the sorted state.
    w = s_mass[None, :]
    cols = [s_mass[None, :], s_pos * w, s_vel * w]
    if with_acc:
        cols.append(s_acc * w)
    n_pref = 10 if with_acc else 7
    pref = _comp_prefix(jnp.concatenate(cols, axis=0))   # (2P, npad+1)

    fr_s = far_range[:, 0, :].reshape(ng * L)
    fr_e = far_range[:, 1, :].reshape(ng * L)

    # Append sliver RANGES as ordinary entries (slot list_cap-1 stays
    # reserved for the residual); overflow folds its MOMENTS into the
    # residual accumulator (tiny ng x SLIVER_CAP gather).
    k = jnp.arange(SLIVER_CAP, dtype=jnp.int32)[None, :]
    take = k < sl_n[:, None]
    fits = take & (far_n[:, None] + k < list_cap - 1)
    slot = far_n[:, None] + k
    gi = jnp.arange(ng, dtype=jnp.int32)[:, None]
    flat = jnp.where(fits, gi * L + slot, ng * L)
    fr_s = fr_s.at[flat.reshape(-1)].set(sl_start.reshape(-1),
                                         mode="drop")
    fr_e = fr_e.at[flat.reshape(-1)].set(sl_end.reshape(-1), mode="drop")
    far_n = jnp.minimum(far_n + sl_n, list_cap - 1)

    over = take & ~fits
    def fold(res):
        seg_sl = _comp_seg(pref, sl_start, sl_end)       # (P, ng, SC)
        om = jnp.where(over, 1.0, 0.0)
        return res + jnp.stack(
            [jnp.sum(seg_sl[i] * om, axis=1) for i in range(n_pref)],
            axis=1)
    res = jax.lax.cond(jnp.any(over), fold, lambda r: r, res)

    # Pool-capacity guard: the static tile cap bounds the CUMULATIVE
    # layout, and a group whose tiles would start past it must not be
    # assembled at all — its pstart would send the eval kernel's tile
    # DMA out of bounds (an unrecoverable device INTERNAL error,
    # observed at the 20M EXTREME scale round 4).  Such a group's
    # ENTIRE far list folds into its mass-conserving residual: bounded
    # error on a rare path, never a crash.  Chunked so the fold's
    # prefix-sum gathers stay ~(ng, 512) per step instead of (ng, L).
    tiles_try = (far_n + 1 + tile - 1) // tile           # +1: residual
    start_try = jnp.cumsum(tiles_try) - tiles_try
    # The last ng tiles are reserved so every folded group's single
    # residual tile provably fits in the second layout pass.
    unfit = start_try + tiles_try > cap_tiles - ng

    def fold_groups(args):
        res, far_n = args
        fs2 = fr_s.reshape(ng, L)
        fe2 = fr_e.reshape(ng, L)
        CH = 512 if L % 512 == 0 else L

        def chunk(i, acc):
            sl = jax.lax.dynamic_slice_in_dim(fs2, i * CH, CH, 1)
            el = jax.lax.dynamic_slice_in_dim(fe2, i * CH, CH, 1)
            seg = _comp_seg(pref, sl, el)                # (P, ng, CH)
            em = ((i * CH + jnp.arange(CH, dtype=jnp.int32))[None, :]
                  < far_n[:, None]) & unfit[:, None]
            emf = jnp.where(em, 1.0, 0.0)
            return acc + jnp.stack(
                [jnp.sum(seg[p] * emf, axis=1) for p in range(n_pref)],
                axis=1)
        add = jax.lax.fori_loop(
            0, L // CH, chunk, jnp.zeros((ng, n_pref), jnp.float32))
        return res + add, jnp.where(unfit, 0, far_n)

    res, far_n = jax.lax.cond(jnp.any(unfit), fold_groups,
                              lambda a: a, (res, far_n))

    # Residual slot (appended right after the real entries, like the
    # dense path).
    res_m = res[:, 0]
    has_res = res_m > 0
    far_n_tot = far_n + has_res.astype(jnp.int32)

    # --- pool assembly ---
    tiles_g = (far_n_tot + tile - 1) // tile
    pstart = (jnp.cumsum(tiles_g) - tiles_g).astype(jnp.int32)
    t_idx = jnp.arange(cap_tiles, dtype=jnp.int32)
    g_of = (jnp.searchsorted(pstart, t_idx, side="right") - 1).astype(
        jnp.int32)
    g_c = jnp.clip(g_of, 0, ng - 1)
    k_of = t_idx - pstart[g_c]
    ent = k_of[:, None] * tile + jnp.arange(tile, dtype=jnp.int32)[None]
    valid = ((t_idx < jnp.sum(tiles_g))[:, None]
             & (ent < far_n_tot[g_c][:, None]))
    is_res = valid & has_res[g_c][:, None] & (
        ent == (far_n_tot[g_c] - 1)[:, None])
    is_rng = valid & ~is_res
    idx = jnp.where(is_rng, g_c[:, None] * L + jnp.minimum(ent, L - 1),
                    ng * L).reshape(-1)

    fse = jnp.pad(jnp.stack([fr_s, fr_e]), ((0, 0), (0, 1)))
    fsel = fse[:, idx]                                   # one packed gather
    fs_p, fe_p = fsel[0], fsel[1]
    seg = _comp_seg(pref, fs_p, fe_p)                    # 2 packed gathers
    m = seg[0]
    inv = jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-30), 0.0)
    zero = jnp.zeros_like(m)
    rows = [seg[1] * inv, seg[2] * inv, seg[3] * inv,
            seg[4] * inv, seg[5] * inv, seg[6] * inv, m]
    rows += ([seg[7] * inv, seg[8] * inv, seg[9] * inv] if with_acc
             else [zero] * 3)
    rows += [(fs_p >> 16).astype(jnp.float32),
             (fs_p & 0xFFFF).astype(jnp.float32),
             (fe_p >> 16).astype(jnp.float32),
             (fe_p & 0xFFFF).astype(jnp.float32),
             zero, zero]
    pool = jnp.stack(rows).reshape(POOL_ROWS, cap_tiles, tile).transpose(
        1, 0, 2)

    # Residual values (fs = fe = 0 -> refresh REBASES them, like dense).
    inv_m = jnp.where(has_res, 1.0 / jnp.maximum(res_m, 1e-30), 0.0)
    zg = jnp.zeros((ng,), jnp.float32)
    res_rows = [res[:, 1] * inv_m, res[:, 2] * inv_m, res[:, 3] * inv_m,
                res[:, 4] * inv_m, res[:, 5] * inv_m, res[:, 6] * inv_m,
                res_m]
    res_rows += ([res[:, 7] * inv_m, res[:, 8] * inv_m, res[:, 9] * inv_m]
                 if with_acc else [zg] * 3)
    res_rows += [zg] * (POOL_ROWS - len(res_rows))
    rslot = jnp.maximum(far_n_tot - 1, 0)
    t_of = jnp.where(has_res, pstart + rslot // tile, cap_tiles)
    pool = pool.at[t_of, :, rslot % tile].set(
        jnp.stack(res_rows, axis=1), mode="drop")        # (ng, 16)

    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    if near is None:
        near = jnp.zeros((ng, 0), jnp.int32)
    return BHLists(order=order_pad, inv_order=inv_order,
                   far=None, far_n=far_n_tot,
                   ref_pos=pos, steps_since=jnp.int32(0), near=near,
                   far_range=None, steps_build=jnp.int32(0),
                   pool=pool, pstart=pstart)


def _finish_pool_cellid(tree, level_offsets, fr_id, far_n, sl_start,
                        sl_end, sl_n, res, s_pos, s_vel, s_mass, order,
                        order_pad, pos, n, list_cap, *, tile, cap_tiles,
                        s_acc=None, near=None):
    """Cell-id finish: pool moments come straight from the cell tables.

    Every far entry the traversal emits IS an octree cell, and with
    occupancy-tight tree caps the whole tree's attribute tables are a
    few hundred K columns — so instead of re-deriving each entry's
    moments from compensated prefix-sum differences at its body-range
    endpoints (2 extra packed endpoint gathers + Fast2Sum math over
    every pool slot, :func:`_finish_pool_ranges`), assembly gathers the
    finished moments (and the body range, as exact 16-bit f32 halves)
    from ONE global table with ONE packed gather per pool slot.  The
    moments are the octree's own segment sums — the same identity, one
    association order earlier.  Slivers (window-straddle fragments;
    arbitrary body ranges, not cells) keep the prefix-sum machinery but
    number ≤ SLIVER_CAP per group: their moments append to the table as
    extra columns and their entries carry synthetic ids.  Pool layout
    and semantics are identical to the ranges finish.
    """
    ng = far_n.shape[0]
    L = list_cap
    with_acc = s_acc is not None
    n_pref = 10 if with_acc else 7
    SC = SLIVER_CAP
    C_tot = level_offsets[-1]
    zid = C_tot + ng * SC                       # reserved zero column

    fr_id = fr_id.reshape(ng * L)

    # --- global cell table: [com3, vel3, mass, (acc3), bs_hi, bs_lo,
    # cnt_hi, cnt_lo] ---  (ints ride as EXACT 16-bit f32 halves; int32
    # must not bitcast through f32 on TPU — denormal flush.)
    def level_rows(lv):
        rows = [lv.com[0], lv.com[1], lv.com[2],
                lv.vel[0], lv.vel[1], lv.vel[2], lv.mass]
        if with_acc:
            rows += [lv.acc[0], lv.acc[1], lv.acc[2]]
        bs, cnt = lv.body_start, lv.count
        rows += [(bs >> 16).astype(jnp.float32),
                 (bs & 0xFFFF).astype(jnp.float32),
                 (cnt >> 16).astype(jnp.float32),
                 (cnt & 0xFFFF).astype(jnp.float32)]
        return jnp.stack(rows)
    table = jnp.concatenate([level_rows(lv) for lv in tree.levels],
                            axis=1)             # (R_t, C_tot)
    R_t = n_pref + 4

    # --- sliver moments (prefix sums only over these ≤ ng*SC ranges) ---
    w = s_mass[None, :]
    cols = [s_mass[None, :], s_pos * w, s_vel * w]
    if with_acc:
        cols.append(s_acc * w)
    pref = _comp_prefix(jnp.concatenate(cols, axis=0))   # (2P, npad+1)
    seg_sl = _comp_seg(pref, sl_start, sl_end)           # (P, ng, SC)
    m_sl = seg_sl[0]
    inv_sl = jnp.where(m_sl > 0, 1.0 / jnp.maximum(m_sl, 1e-30), 0.0)
    sl_rows = [seg_sl[i + 1].reshape(ng * SC) * inv_sl.reshape(ng * SC)
               for i in range(n_pref - 1)]
    sl_rows.insert(6, m_sl.reshape(ng * SC))
    # insert puts mass at row 6 => layout [com3, vel3, mass, (acc3)]
    cnt_sl = (sl_end - sl_start).reshape(ng * SC)
    bs_sl = sl_start.reshape(ng * SC)
    sl_rows += [(bs_sl >> 16).astype(jnp.float32),
                (bs_sl & 0xFFFF).astype(jnp.float32),
                (cnt_sl >> 16).astype(jnp.float32),
                (cnt_sl & 0xFFFF).astype(jnp.float32)]
    table = jnp.concatenate(
        [table, jnp.stack(sl_rows),
         jnp.zeros((R_t, 1), jnp.float32)], axis=1)  # (R_t, zid + 1)

    # --- append sliver entries (slot L-1 reserved for the residual) ---
    k = jnp.arange(SC, dtype=jnp.int32)[None, :]
    take = k < sl_n[:, None]
    fits = take & (far_n[:, None] + k < list_cap - 1)
    slot = far_n[:, None] + k
    gi = jnp.arange(ng, dtype=jnp.int32)[:, None]
    flat = jnp.where(fits, gi * L + slot, ng * L)
    sl_ids = C_tot + (gi * SC + k)
    fr_id = fr_id.at[flat.reshape(-1)].set(sl_ids.reshape(-1),
                                           mode="drop")
    far_n = jnp.minimum(far_n + sl_n, list_cap - 1)

    over = take & ~fits
    def fold(res):
        om = jnp.where(over, 1.0, 0.0)
        return res + jnp.stack(
            [jnp.sum(seg_sl[i] * om, axis=1) for i in range(n_pref)],
            axis=1)
    res = jax.lax.cond(jnp.any(over), fold, lambda r: r, res)

    # --- pool-capacity guard (same contract as the ranges finish) ---
    tiles_try = (far_n + 1 + tile - 1) // tile           # +1: residual
    start_try = jnp.cumsum(tiles_try) - tiles_try
    unfit = start_try + tiles_try > cap_tiles - ng

    def fold_groups(args):
        res, far_n = args
        fi2 = fr_id.reshape(ng, L)
        CH = 512 if L % 512 == 0 else L

        def chunk(i, acc):
            ids = jax.lax.dynamic_slice_in_dim(fi2, i * CH, CH, 1)
            t = table[:, ids.reshape(-1)].reshape(R_t, ng, CH)
            m = t[6]
            em = ((i * CH + jnp.arange(CH, dtype=jnp.int32))[None, :]
                  < far_n[:, None]) & unfit[:, None]
            mw = jnp.where(em, m, 0.0)
            parts = [mw] + [t[r] * mw for r in list(range(6))
                            + (list(range(7, 10)) if with_acc else [])]
            return acc + jnp.stack([jnp.sum(p, axis=1) for p in parts],
                                   axis=1)
        add = jax.lax.fori_loop(
            0, L // CH, chunk, jnp.zeros((ng, n_pref), jnp.float32))
        return res + add, jnp.where(unfit, 0, far_n)

    res, far_n = jax.lax.cond(jnp.any(unfit), fold_groups,
                              lambda a: a, (res, far_n))

    res_m = res[:, 0]
    has_res = res_m > 0
    far_n_tot = far_n + has_res.astype(jnp.int32)

    # --- pool assembly: ONE packed table gather per slot ---
    tiles_g = (far_n_tot + tile - 1) // tile
    pstart = (jnp.cumsum(tiles_g) - tiles_g).astype(jnp.int32)
    tot_tiles = jnp.sum(tiles_g)
    padded_ids = jnp.pad(fr_id, (0, 1), constant_values=zid)

    def assemble(t_idx):
        CT = t_idx.shape[0]
        g_of = (jnp.searchsorted(pstart, t_idx, side="right") - 1).astype(
            jnp.int32)
        g_c = jnp.clip(g_of, 0, ng - 1)
        k_of = t_idx - pstart[g_c]
        ent = (k_of[:, None] * tile
               + jnp.arange(tile, dtype=jnp.int32)[None])
        valid = ((t_idx < tot_tiles)[:, None]
                 & (ent < far_n_tot[g_c][:, None]))
        is_res = valid & has_res[g_c][:, None] & (
            ent == (far_n_tot[g_c] - 1)[:, None])
        is_rng = valid & ~is_res
        idx = jnp.where(is_rng,
                        g_c[:, None] * L + jnp.minimum(ent, L - 1),
                        ng * L).reshape(-1)
        ids = padded_ids[idx]
        t = table[:, ids]                    # ONE packed gather
        bs_p = ((t[n_pref].astype(jnp.int32) << 16)
                | t[n_pref + 1].astype(jnp.int32))
        fe_p = bs_p + ((t[n_pref + 2].astype(jnp.int32) << 16)
                       | t[n_pref + 3].astype(jnp.int32))
        zero = jnp.zeros_like(t[0])
        rows = [t[0], t[1], t[2], t[3], t[4], t[5], t[6]]
        rows += ([t[7], t[8], t[9]] if with_acc else [zero] * 3)
        rows += [(bs_p >> 16).astype(jnp.float32),
                 (bs_p & 0xFFFF).astype(jnp.float32),
                 (fe_p >> 16).astype(jnp.float32),
                 (fe_p & 0xFFFF).astype(jnp.float32),
                 zero, zero]
        return jnp.stack(rows).reshape(POOL_ROWS, CT, tile).transpose(
            1, 0, 2)

    # Chunked assembly above ~8.4M slots: the monolithic row stack +
    # transpose materializes 2x the whole pool (the finish transient
    # that tipped 10M into ResourceExhausted, diag10m.log) — per-chunk
    # blocks keep the transient a few hundred MB at any scale.  The
    # last chunk's start is clamped; its overlap region recomputes the
    # same tiles, so the overwrite is value-identical.
    CHT = _POOL_ASM_CHUNK
    if cap_tiles <= 2 * CHT:
        pool = assemble(jnp.arange(cap_tiles, dtype=jnp.int32))
    else:
        nch = -(-cap_tiles // CHT)

        def chunk(i, pool):
            start = jnp.minimum(i * CHT, cap_tiles - CHT)
            block = assemble(start + jnp.arange(CHT, dtype=jnp.int32))
            return jax.lax.dynamic_update_slice(pool, block,
                                                (start, 0, 0))
        pool = jax.lax.fori_loop(
            0, nch, chunk,
            jnp.zeros((cap_tiles, POOL_ROWS, tile), jnp.float32))

    # Residual values (fs = fe = 0 -> refresh REBASES them).
    inv_m = jnp.where(has_res, 1.0 / jnp.maximum(res_m, 1e-30), 0.0)
    zg = jnp.zeros((ng,), jnp.float32)
    res_rows = [res[:, 1] * inv_m, res[:, 2] * inv_m, res[:, 3] * inv_m,
                res[:, 4] * inv_m, res[:, 5] * inv_m, res[:, 6] * inv_m,
                res_m]
    res_rows += ([res[:, 7] * inv_m, res[:, 8] * inv_m, res[:, 9] * inv_m]
                 if with_acc else [zg] * 3)
    res_rows += [zg] * (POOL_ROWS - len(res_rows))
    rslot = jnp.maximum(far_n_tot - 1, 0)
    t_of = jnp.where(has_res, pstart + rslot // tile, cap_tiles)
    pool = pool.at[t_of, :, rslot % tile].set(
        jnp.stack(res_rows, axis=1), mode="drop")        # (ng, 16)

    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    if near is None:
        near = jnp.zeros((ng, 0), jnp.int32)
    return BHLists(order=order_pad, inv_order=inv_order,
                   far=None, far_n=far_n_tot,
                   ref_pos=pos, steps_since=jnp.int32(0), near=near,
                   far_range=None, steps_build=jnp.int32(0),
                   pool=pool, pstart=pstart)


def _finish_pool_compact(emits, far_n, sl_start, sl_end, sl_n, res,
                         s_pos, s_vel, s_mass, order, order_pad, pos, n,
                         list_cap, *, tile, cap_tiles, emit_offsets,
                         s_acc=None, near=None):
    """Compact-emission finish: straight into the tile pool, scatter-free.

    Same contract (and bit-identical pool) as :func:`_finish_pool_ranges`,
    but the traversal's entries arrive as per-level dense segments
    (:class:`CompactEmits`) instead of (ng, 2, L) slot arrays — the
    (ng*L) intermediates and every slot scatter disappear from the
    rebuild.  Slivers join as one more per-group-padded source segment.
    Pool-slot decoding costs per-TILE gathers of a small per-group
    cumulative table plus ≤ n_seg dense selects per slot.
    """
    ng = far_n.shape[0]
    L = list_cap
    with_acc = s_acc is not None
    n_pref = 10 if with_acc else 7
    n_levels = emits.cnt.shape[0]
    n_seg = n_levels + 1

    w = s_mass[None, :]
    cols = [s_mass[None, :], s_pos * w, s_vel * w]
    if with_acc:
        cols.append(s_acc * w)
    pref = _comp_prefix(jnp.concatenate(cols, axis=0))   # (2P, npad+1)

    # Sliver acceptance: the k-th sliver of a group fits iff
    # far_n + k < L - 1 (slot L-1 reserved for the residual) — the same
    # positional prefix rule as the slot path's append.
    k = jnp.arange(SLIVER_CAP, dtype=jnp.int32)[None, :]
    take = k < sl_n[:, None]
    fits = take & (far_n[:, None] + k < L - 1)
    sl_cnt = jnp.sum(fits.astype(jnp.int32), axis=1)
    over = take & ~fits

    def fold(res):
        seg_sl = _comp_seg(pref, sl_start, sl_end)       # (P, ng, SC)
        om = jnp.where(over, 1.0, 0.0)
        return res + jnp.stack(
            [jnp.sum(seg_sl[i] * om, axis=1) for i in range(n_pref)],
            axis=1)
    res = jax.lax.cond(jnp.any(over), fold, lambda r: r, res)
    far_n = far_n + sl_cnt

    # Per-group cumulative segment table (levels then slivers) and the
    # per-segment source bases into the concatenated source rows.
    cnt_seg = jnp.concatenate([emits.cnt, sl_cnt[None, :]], axis=0)
    Bt = jnp.concatenate([jnp.zeros((1, ng), jnp.int32),
                          jnp.cumsum(cnt_seg, axis=0)])   # (n_seg+1, ng)
    lgs = jnp.cumsum(emits.cnt, axis=1) - emits.cnt       # (n_levels, ng)
    offs = jnp.asarray(emit_offsets[:n_levels], jnp.int32)[:, None]
    sl_base = (emit_offsets[n_levels]
               + SLIVER_CAP * jnp.arange(ng, dtype=jnp.int32))[None, :]
    src_base = jnp.concatenate([offs + lgs, sl_base])     # (n_seg, ng)
    src_rows = jnp.concatenate(
        [emits.ent, jnp.stack([sl_start.reshape(-1),
                               sl_end.reshape(-1)])], axis=1)
    src_rows = jnp.pad(src_rows, ((0, 0), (0, 1)))        # fs = fe = 0
    ZERO_SRC = src_rows.shape[1] - 1

    # Pool-capacity guard (same semantics as _finish_pool_ranges): a
    # group whose tiles would start past the cap folds its whole list —
    # levels AND slivers — into the residual.  Rare path under cond;
    # per-entry group ids come from the per-level group starts.
    tiles_try = (far_n + 1 + tile - 1) // tile            # +1: residual
    start_try = jnp.cumsum(tiles_try) - tiles_try
    unfit = start_try + tiles_try > cap_tiles - ng

    def fold_groups(args):
        res, far_n = args
        adds = jnp.zeros((ng, n_pref), jnp.float32)
        for s in range(n_levels):
            E = emit_offsets[s + 1] - emit_offsets[s]
            seg_ent = jax.lax.dynamic_slice_in_dim(
                src_rows, emit_offsets[s], E, axis=1)
            p = jnp.arange(E, dtype=jnp.int32)
            gsrc = (jnp.searchsorted(lgs[s], p, side="right") - 1
                    ).astype(jnp.int32)
            gsrc = jnp.clip(gsrc, 0, ng - 1)
            segm = _comp_seg(pref, seg_ent[0], seg_ent[1])   # (P, E)
            em = jnp.where(unfit[gsrc], 1.0, 0.0)
            gseg = jnp.where(unfit[gsrc], gsrc, ng)
            adds = adds + jnp.stack(
                [jax.ops.segment_sum(segm[i] * em, gseg,
                                     num_segments=ng)
                 for i in range(n_pref)], axis=1)
        seg_sl = _comp_seg(pref, sl_start, sl_end)
        om = jnp.where(fits & unfit[:, None], 1.0, 0.0)
        adds = adds + jnp.stack(
            [jnp.sum(seg_sl[i] * om, axis=1) for i in range(n_pref)],
            axis=1)
        return res + adds, jnp.where(unfit, 0, far_n)

    res, far_n = jax.lax.cond(jnp.any(unfit), fold_groups,
                              lambda a: a, (res, far_n))

    res_m = res[:, 0]
    has_res = res_m > 0
    far_n_tot = far_n + has_res.astype(jnp.int32)

    # --- pool assembly ---
    tiles_g = (far_n_tot + tile - 1) // tile
    pstart = (jnp.cumsum(tiles_g) - tiles_g).astype(jnp.int32)
    t_idx = jnp.arange(cap_tiles, dtype=jnp.int32)
    g_of = (jnp.searchsorted(pstart, t_idx, side="right") - 1).astype(
        jnp.int32)
    g_c = jnp.clip(g_of, 0, ng - 1)
    k_of = t_idx - pstart[g_c]
    ent_i = k_of[:, None] * tile + jnp.arange(tile, dtype=jnp.int32)[None]
    valid = ((t_idx < jnp.sum(tiles_g))[:, None]
             & (ent_i < far_n_tot[g_c][:, None]))
    is_res = valid & has_res[g_c][:, None] & (
        ent_i == (far_n_tot[g_c] - 1)[:, None])
    is_rng = valid & ~is_res

    # Decode each pool slot's (segment, source index): per-TILE gathers
    # of the cumulative tables (cap_tiles-sized — thousands, not
    # millions), then dense compare/select chains over the slots.
    Bg = Bt[:, g_c]                                       # (n_seg+1, ct)
    Sg = src_base[:, g_c]                                 # (n_seg, ct)
    seg_id = jnp.zeros(ent_i.shape, jnp.int32)
    for s in range(1, n_seg):
        seg_id = seg_id + (ent_i >= Bg[s][:, None]).astype(jnp.int32)
    src = jnp.full(ent_i.shape, ZERO_SRC, jnp.int32)
    for s in range(n_seg):
        sel = is_rng & (seg_id == s)
        src = jnp.where(sel, Sg[s][:, None] + (ent_i - Bg[s][:, None]),
                        src)
    idx = jnp.where(is_rng, src, ZERO_SRC).reshape(-1)

    fsel = src_rows[:, idx]                               # one packed gather
    fs_p, fe_p = fsel[0], fsel[1]
    seg = _comp_seg(pref, fs_p, fe_p)                     # 2 packed gathers
    m = seg[0]
    inv = jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-30), 0.0)
    zero = jnp.zeros_like(m)
    rows = [seg[1] * inv, seg[2] * inv, seg[3] * inv,
            seg[4] * inv, seg[5] * inv, seg[6] * inv, m]
    rows += ([seg[7] * inv, seg[8] * inv, seg[9] * inv] if with_acc
             else [zero] * 3)
    rows += [(fs_p >> 16).astype(jnp.float32),
             (fs_p & 0xFFFF).astype(jnp.float32),
             (fe_p >> 16).astype(jnp.float32),
             (fe_p & 0xFFFF).astype(jnp.float32),
             zero, zero]
    pool = jnp.stack(rows).reshape(POOL_ROWS, cap_tiles, tile).transpose(
        1, 0, 2)

    # Residual values (fs = fe = 0 -> refresh REBASES them, like dense).
    inv_m = jnp.where(has_res, 1.0 / jnp.maximum(res_m, 1e-30), 0.0)
    zg = jnp.zeros((ng,), jnp.float32)
    res_rows = [res[:, 1] * inv_m, res[:, 2] * inv_m, res[:, 3] * inv_m,
                res[:, 4] * inv_m, res[:, 5] * inv_m, res[:, 6] * inv_m,
                res_m]
    res_rows += ([res[:, 7] * inv_m, res[:, 8] * inv_m, res[:, 9] * inv_m]
                 if with_acc else [zg] * 3)
    res_rows += [zg] * (POOL_ROWS - len(res_rows))
    rslot = jnp.maximum(far_n_tot - 1, 0)
    t_of = jnp.where(has_res, pstart + rslot // tile, cap_tiles)
    pool = pool.at[t_of, :, rslot % tile].set(
        jnp.stack(res_rows, axis=1), mode="drop")         # (ng, 16)

    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    if near is None:
        near = jnp.zeros((ng, 0), jnp.int32)
    return BHLists(order=order_pad, inv_order=inv_order,
                   far=None, far_n=far_n_tot,
                   ref_pos=pos, steps_since=jnp.int32(0), near=near,
                   far_range=None, steps_build=jnp.int32(0),
                   pool=pool, pstart=pstart)


def refresh_lists(lists: BHLists, pos_s, vel_s, mass_s, acc_s=None,
                  dt=0.0, tau_clamp=24.0):
    """Re-materialize every far entry's moments from the CURRENT state.

    The structural insight behind long rebuild intervals: each far entry
    is a contiguous run ``[start, end)`` of the frozen sorted order
    (``lists.far_range``), so its EXACT current monopole moments come
    from prefix sums over the current sorted state — no sort, no octree,
    no traversal.  A refresh zeroes the frozen-advance error (the ½|a|τ²
    tail that dominated between-rebuild error, measured 23-26% rms at
    τ=48) and resets ``steps_since``; what remains until the next full
    rebuild is only the slow geometric decay of the build-time
    acceptance (cells deform as bodies drift).

    Entries without a range (the reserved residual slot) are REBASED
    instead: their stored com/vel advance by the elapsed τ so the
    per-step advance stays continuous across the reset.  Quadrupole
    rows, if present, keep their build values (their drift is higher
    order).  ``steps_build`` keeps counting — the rebuild policy is
    unaffected by refreshes.

    Inputs are SORTED (3, n)/(n,) state arrays (the production layout).
    Returns the refreshed :class:`BHLists`.
    """
    npad = lists.order.shape[0]
    n = pos_s.shape[1]
    pad = npad - n
    if pad:
        pos_s = jnp.concatenate(
            [pos_s, jnp.broadcast_to(pos_s[:, -1:], (3, pad))], axis=1)
        mass_s = jnp.concatenate([mass_s, jnp.zeros((pad,))])
        vel_s = jnp.concatenate([vel_s, jnp.zeros((3, pad))], axis=1)
        if acc_s is not None:
            acc_s = jnp.concatenate([acc_s, jnp.zeros((3, pad))], axis=1)

    if lists.pool is not None:
        return _refresh_pool(lists, pos_s, vel_s, mass_s, acc_s, dt,
                             tau_clamp)
    far_new = _refresh_dense_core(lists.far, lists.far_range, pos_s,
                                  vel_s, mass_s, acc_s,
                                  lists.steps_since, dt, tau_clamp)
    return lists._replace(far=far_new, steps_since=jnp.int32(0))


def _refresh_dense_core(far, far_range, pos_s, vel_s, mass_s, acc_s,
                        steps_since, dt, tau_clamp):
    """Dense-layout refresh body: (far, far_range, padded sorted state)
    -> refreshed far.  Shared by :func:`refresh_lists` and the sharded
    engine (which all_gathers the globally-sorted state and refreshes
    only its own shard of groups — ``far_range`` holds GLOBAL sorted
    slots, so ``pos_s``.. must be the full sorted arrays there)."""
    ng, R, L = far.shape
    quad, acc0 = far_layout(R)
    with_acc = acc_s is not None and acc0 is not None

    w = mass_s[None, :]
    cols = [w, pos_s * w, vel_s * w]
    if with_acc:
        cols.append(acc_s * w)
    pref = _comp_prefix(jnp.concatenate(cols, axis=0))

    fs = far_range[:, 0, :].reshape(ng * L)
    fe = far_range[:, 1, :].reshape(ng * L)
    seg = _comp_seg(pref, fs, fe)                    # (P, ng*L) 2 gathers
    m = seg[0]
    inv = jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-30), 0.0)
    new_rows = [seg[1] * inv, seg[2] * inv, seg[3] * inv,
                seg[4] * inv, seg[5] * inv, seg[6] * inv, m]
    if quad:
        new_rows += [far[:, 7 + i, :].reshape(ng * L) for i in range(6)]
    if acc0 is not None:
        new_rows += ([seg[7] * inv, seg[8] * inv, seg[9] * inv]
                     if with_acc
                     else [far[:, acc0 + i, :].reshape(ng * L)
                           for i in range(3)])
    new_rows += [jnp.zeros((ng * L,), jnp.float32)] * (R - len(new_rows))
    new = jnp.stack(new_rows).reshape(R, ng, L).transpose(1, 0, 2)

    # Rebase rangeless entries (residual slot) so their advance is
    # continuous through the τ reset.
    tau = jnp.asarray(steps_since, jnp.float32) * dt
    old = far
    old_com = old[:, 0:3, :] + old[:, 3:6, :] * tau
    old_vel = old[:, 3:6, :]
    if acc0 is not None:
        tc = jnp.minimum(tau, jnp.float32(tau_clamp) * dt)
        old_com = old_com + old[:, acc0:acc0 + 3, :] * (
            tc * tau - 0.5 * tc * tc)
        old_vel = old_vel + old[:, acc0:acc0 + 3, :] * tc
    rebased = jnp.concatenate(
        [old_com, old_vel, old[:, 6:, :]], axis=1)
    valid = (fe > fs).reshape(ng, 1, L)
    return jnp.where(valid, new, rebased)


def _refresh_pool(lists, pos_s, vel_s, mass_s, acc_s, dt, tau_clamp):
    """Pool variant of :func:`refresh_lists` (inputs already padded).

    Two packed gathers over ~pool entries instead of ~ng*L slots — the
    pool's compaction is what makes frequent refreshes affordable.
    Padding/invalid entries have fs == fe == 0 and refresh to zero
    mass; rangeless (residual) entries REBASE like the dense path.
    """
    pool = lists.pool
    ct, _, tile = pool.shape
    with_acc = acc_s is not None

    w = mass_s[None, :]
    cols = [w, pos_s * w, vel_s * w,
            (acc_s * w if with_acc
             else jnp.zeros((3, pos_s.shape[1]), jnp.float32))]
    pref = _comp_prefix(jnp.concatenate(cols, axis=0))

    fs, fe = _pool_ranges(pool)
    seg = _comp_seg(pref, fs, fe)                    # 2 packed gathers
    m = seg[0]
    inv = jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-30), 0.0)
    new10 = jnp.stack([seg[1] * inv, seg[2] * inv, seg[3] * inv,
                       seg[4] * inv, seg[5] * inv, seg[6] * inv, m,
                       seg[7] * inv, seg[8] * inv, seg[9] * inv])

    flatp = pool.transpose(1, 0, 2).reshape(POOL_ROWS, ct * tile)
    tau = lists.steps_since.astype(jnp.float32) * dt
    tc = jnp.minimum(tau, jnp.float32(tau_clamp) * dt)
    old_com = (flatp[0:3] + flatp[3:6] * tau
               + flatp[7:10] * (tc * tau - 0.5 * tc * tc))
    old_vel = flatp[3:6] + flatp[7:10] * tc
    rebased = jnp.concatenate([old_com, old_vel, flatp[6:7],
                               flatp[7:10]])
    valid = (fe > fs)[None, :]
    out = jnp.concatenate([jnp.where(valid, new10, rebased),
                           flatp[10:16]])
    pool_new = out.reshape(POOL_ROWS, ct, tile).transpose(1, 0, 2)
    return lists._replace(pool=pool_new, steps_since=jnp.int32(0))


# ---------------------------------------------------------------------------
# Per-step dense evaluation
# ---------------------------------------------------------------------------

# The frozen-entry advance (com + v·τ + a·(t_c·τ − t_c²/2), t_c clamped
# at the orbital-curvature horizon) lives IN the Pallas kernel
# (bh_eval_kernel._advanced_tile) and inline in the XLA oracle below —
# round 2 pre-materialized an advanced tensor per step, ~1.3 GB of HBM
# round-trip at 1M.


def _window_sources(s_pos, s_mass, ng, gsz, window_groups):
    """Window sources per group via shifted slices (no gathers).

    Returns (ng, 3, W) positions and (ng, W) masses, W=(2·wg+1)·gsz.
    """
    wg = window_groups
    ppos = jnp.pad(s_pos, ((0, 0), (wg * gsz, wg * gsz)))
    pmass = jnp.pad(s_mass, ((wg * gsz, wg * gsz),))
    npts = ng * gsz
    pos_shifts = jnp.stack([
        jax.lax.dynamic_slice_in_dim(ppos, k * gsz, npts, axis=1)
        .reshape(3, ng, gsz)
        for k in range(2 * wg + 1)], axis=2)            # (3, ng, S, gsz)
    mass_shifts = jnp.stack([
        jax.lax.dynamic_slice_in_dim(pmass, k * gsz, npts)
        .reshape(ng, gsz)
        for k in range(2 * wg + 1)], axis=1)            # (ng, S, gsz)
    W = (2 * wg + 1) * gsz
    return (pos_shifts.transpose(1, 0, 2, 3).reshape(ng, 3, W),
            mass_shifts.reshape(ng, W))


def _dense_accel_quad(gpos, src_pos, src_mass, src_q, G, soft_sq):
    """Monopole + traceless-quadrupole forces, direct-difference form.

    a = Σ m·d/r³ − (Q·d)/r⁵ + (5/2)(dᵀQd)·d/r⁷  with d = source − target
    (the −∇ of Φ = −[m/r + dᵀQd/(2r⁵)]).  XLA fallback / oracle for the
    Pallas kernel's quadrupole path; shapes ``(c, 3, gsz)`` × ``(c, 3, S)``
    with ``src_q`` ``(c, 6, S)`` rows (qxx, qyy, qzz, qxy, qxz, qyz).
    """
    d = src_pos[:, :, None, :] - gpos[:, :, :, None]      # (c, 3, gsz, S)
    dist_sq = jnp.sum(d * d, axis=1) + soft_sq            # (c, gsz, S)
    gate = dist_sq > soft_sq
    inv = jax.lax.rsqrt(dist_sq)
    inv2 = inv * inv
    inv3 = jnp.where(gate, inv * inv2, 0.0)
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    qxx, qyy, qzz, qxy, qxz, qyz = (src_q[:, i, None, :] for i in range(6))
    qdx = qxx * dx + qxy * dy + qxz * dz
    qdy = qxy * dx + qyy * dy + qyz * dz
    qdz = qxz * dx + qyz * dy + qzz * dz
    dqd = dx * qdx + dy * qdy + dz * qdz
    inv5 = inv3 * inv2
    cw = src_mass[:, None, :] * inv3 + 2.5 * dqd * inv5 * inv2
    ax = jnp.sum(cw * dx - inv5 * qdx, axis=2)            # (c, gsz)
    ay = jnp.sum(cw * dy - inv5 * qdy, axis=2)
    az = jnp.sum(cw * dz - inv5 * qdz, axis=2)
    return G * jnp.stack([ax, ay, az], axis=1)            # (c, 3, gsz)


def _dense_accel(gpos, src_pos, src_mass, G, soft_sq):
    """Batched (ng, gsz) × (ng, S) monopole forces, MXU cross terms.

    Inputs must already be group-centred (see eval_accel) so the
    ``|a|²+|b|²−2a·b`` form is numerically safe in f32.
    """
    pi_sq = jnp.sum(gpos * gpos, axis=1)                  # (ng, gsz)
    ps_sq = jnp.sum(src_pos * src_pos, axis=1)            # (ng, S)
    cross = jax.lax.dot_general(
        gpos, src_pos, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # (ng, gsz, S)
    dist_sq = pi_sq[:, :, None] + ps_sq[:, None, :] - 2.0 * cross + soft_sq
    dist_sq = jnp.maximum(dist_sq, soft_sq)
    inv = jax.lax.rsqrt(dist_sq)
    w = jnp.where(dist_sq > soft_sq,
                  (G * src_mass)[:, None, :] * inv * inv * inv, 0.0)
    wp = jax.lax.dot_general(
        w, src_pos, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # (ng, gsz, 3)
    wsum = jnp.sum(w, axis=2)                             # (ng, gsz)
    return wp.transpose(0, 2, 1) - gpos * wsum[:, None, :]


def _eval_sorted_padded(lists: BHLists, s_pos, s_mass, dt, *, G, softening,
                        group_size, window_groups, chunk, use_pallas,
                        far_tile, quadrupole, tau_clamp=24.0, gpp=4,
                        use_cols=False, iblk=0):
    """Core evaluation on already-sorted padded ``(3, npad)`` inputs.

    Returns accelerations in SORTED slot order.  Wrapped by
    :func:`eval_accel` (original-order API, pays permutation gathers) and
    :func:`eval_accel_sorted` (the production stepper's path — the state
    lives sorted between rebuilds, so no gathers at all).
    """
    gsz = group_size
    npad = lists.order.shape[0]
    ng = npad // gsz
    soft_sq = float(softening) ** 2
    Gf = float(G)

    quad = quadrupole

    near = lists.near
    K = 0 if near is None else near.shape[1]

    if use_pallas and lists.pool is not None:
        from spatialsim_tpu.ops.bh_eval_kernel import (
            pallas_window_eval_pool)
        return pallas_window_eval_pool(
            s_pos, s_mass, lists.pool, lists.pstart, lists.far_n,
            lists.steps_since, dt, G=Gf, softening=softening,
            group_size=gsz, window_groups=window_groups,
            groups_per_program=gpp, tau_clamp=float(tau_clamp))
    assert lists.pool is None, \
        "pooled lists require the Pallas eval (no XLA oracle path)"
    if use_pallas:
        from spatialsim_tpu.ops.bh_eval_kernel import pallas_window_eval
        # Raw stored tensors go straight in; the kernel advances each
        # tile to the current τ in-register (no far_eval_tensor
        # materialization).
        return pallas_window_eval(
            s_pos, s_mass, lists.far, lists.far_n,
            near if K else None, lists.steps_since, dt,
            G=Gf, softening=softening, group_size=gsz,
            window_groups=window_groups,
            far_tile=far_tile, groups_per_program=gpp,
            tau_clamp=float(tau_clamp), use_cols=use_cols, iblk=iblk)

    gpos = jnp.moveaxis(s_pos.reshape(3, ng, gsz), 1, 0)      # (ng, 3, gsz)
    center = jnp.mean(gpos, axis=2, keepdims=True)            # (ng, 3, 1)
    gpos_c = gpos - center

    tau = lists.steps_since.astype(jnp.float32) * dt
    far = lists.far
    _, facc0 = far_layout(far.shape[1])
    far_pos = far[:, 0:3, :] + far[:, 3:6, :] * tau           # (ng, 3, L)
    if facc0 is not None:
        tcl = jnp.minimum(tau, jnp.float32(tau_clamp) * dt)
        far_pos = far_pos + far[:, facc0:facc0 + 3, :] * (
            tcl * tau - 0.5 * tcl * tcl)
    far_pos_c = far_pos - center
    far_mass = far[:, 6, :]                                   # (ng, L)
    far_q = (far[:, 7:13, :] if quad
             else jnp.zeros((ng, 6, far.shape[2]), jnp.float32))

    src_pos, src_mass = _window_sources(s_pos, s_mass, ng, gsz,
                                        window_groups)
    if K:
        # Near-group sources via one packed gather (oracle path; the
        # Pallas kernel reads them as block views instead).
        safe = jnp.where((near >= 0) & (near < ng), near, ng)
        P4 = jnp.concatenate(
            [jnp.pad(s_pos, ((0, 0), (0, gsz))),
             jnp.pad(s_mass, (0, gsz))[None, :]], axis=0)  # (4, npad+gsz)
        flat = (safe[:, :, None] * gsz
                + jnp.arange(gsz, dtype=jnp.int32)[None, None, :]
                ).reshape(ng, K * gsz)
        nsrc = P4[:, flat]                                 # (4, ng, K*gsz)
        src_pos = jnp.concatenate(
            [src_pos, jnp.moveaxis(nsrc[0:3], 1, 0)], axis=2)
        src_mass = jnp.concatenate([src_mass, nsrc[3]], axis=1)
    src_pos_c = src_pos - center

    def chunk_eval(args):
        gp, fp, fm, fq, sp, sm = args
        far_acc = (_dense_accel_quad(gp, fp, fm, fq, Gf, soft_sq) if quad
                   else _dense_accel(gp, fp, fm, Gf, soft_sq))
        return far_acc + _dense_accel(gp, sp, sm, Gf, soft_sq)

    c = min(chunk, ng)
    if ng % c != 0:
        c = ng
    parts = (gpos_c.reshape(ng // c, c, 3, gsz),
             far_pos_c.reshape(ng // c, c, 3, -1),
             far_mass.reshape(ng // c, c, -1),
             far_q.reshape(ng // c, c, 6, -1),
             src_pos_c.reshape(ng // c, c, 3, -1),
             src_mass.reshape(ng // c, c, -1))
    acc = jax.lax.map(chunk_eval, parts).reshape(ng, 3, gsz)

    return jnp.moveaxis(acc, 0, 1).reshape(3, npad)


@functools.partial(jax.jit, static_argnames=("group_size", "window_groups",
                                             "G", "softening", "chunk",
                                             "use_pallas", "far_tile",
                                             "quadrupole", "tau_clamp",
                                             "gpp", "use_cols",
                                             "iblk"))
def eval_accel(lists: BHLists, pos, mass, dt, *, G, softening,
               group_size=256, window_groups=3, chunk=64, use_pallas=True,
               far_tile=512, quadrupole=False, tau_clamp=24.0,
               gpp=4, use_cols=False, iblk=0):
    """Accelerations at ORIGINAL-order positions (testing/one-shot API).

    Pays two permutation gathers (sort in, unsort out) — the production
    stepper keeps its state sorted and uses :func:`eval_accel_sorted`
    instead (7M gathers/step ≈ 40 ms at 1M bodies, measured).
    """
    n = pos.shape[1]
    npad = lists.order.shape[0]
    s_pos = pos[:, lists.order]
    pad_mask = jnp.arange(npad) >= n
    s_mass = jnp.where(pad_mask, 0.0, mass[lists.order])
    acc_sorted = _eval_sorted_padded(
        lists, s_pos, s_mass, dt, G=G, softening=softening,
        group_size=group_size, window_groups=window_groups, chunk=chunk,
        use_pallas=use_pallas, far_tile=far_tile, quadrupole=quadrupole,
        tau_clamp=tau_clamp, gpp=gpp, use_cols=use_cols, iblk=iblk)
    return acc_sorted[:, lists.inv_order]


@functools.partial(jax.jit, static_argnames=("group_size", "window_groups",
                                             "G", "softening", "chunk",
                                             "use_pallas", "far_tile",
                                             "quadrupole", "tau_clamp",
                                             "gpp", "use_cols",
                                             "iblk"))
def eval_accel_sorted(lists: BHLists, pos_s, mass_s, dt, *, G, softening,
                      group_size=256, window_groups=3, chunk=64,
                      use_pallas=True, far_tile=512, quadrupole=False,
                      tau_clamp=24.0, gpp=4, use_cols=False, iblk=0):
    """Accelerations for SORTED ``(3, n)`` state — gather-free hot path.

    Pads the group tail by repeating the last body (mass 0) instead of
    gathering through ``lists.order``; returns sorted-order accelerations.
    """
    n = pos_s.shape[1]
    npad = lists.order.shape[0]
    pad = npad - n
    if pad:
        s_pos = jnp.concatenate(
            [pos_s, jnp.broadcast_to(pos_s[:, -1:], (3, pad))], axis=1)
        s_mass = jnp.concatenate(
            [mass_s, jnp.zeros((pad,), mass_s.dtype)])
    else:
        s_pos, s_mass = pos_s, mass_s
    acc_sorted = _eval_sorted_padded(
        lists, s_pos, s_mass, dt, G=G, softening=softening,
        group_size=group_size, window_groups=window_groups, chunk=chunk,
        use_pallas=use_pallas, far_tile=far_tile, quadrupole=quadrupole,
        tau_clamp=tau_clamp, gpp=gpp, use_cols=use_cols, iblk=iblk)
    return acc_sorted[:, :n]


# ---------------------------------------------------------------------------
# Stepper with rebuild policy
# ---------------------------------------------------------------------------

class WindowBHState(NamedTuple):
    """Production-engine state.

    ``pos``/``vel``/``mass`` are stored in MORTON-SORTED order (the order
    of the current lists) — the hot step is then entirely gather-free;
    the sort permutation is only applied at rebuilds, and host-facing
    reads map back through ``lists.inv_order`` (see
    :func:`state_original_order`).
    """

    pos: jax.Array      # (3, n) f32, sorted order
    vel: jax.Array      # (3, n) f32, sorted order
    mass: jax.Array     # (n,) f32, sorted order
    lists: BHLists
    # Previous step's accelerations (sorted order); feeds the rebuild's
    # second-order entry advance (advance_order >= 2).  None when the
    # engine runs first-order.
    acc: jax.Array | None = None


def state_original_order(state: WindowBHState):
    """(pos, vel, mass) views in ORIGINAL body order (host-facing)."""
    inv = state.lists.inv_order
    return state.pos[:, inv], state.vel[:, inv], state.mass[inv]


def _build_kw(config):
    quad = getattr(config, "use_quadrupole", False)
    theta = config.theta
    if quad:
        scale = getattr(config, "quad_accept_scale", 0.0) or 1.0
        theta = theta * scale
    return dict(theta=theta, softening=config.softening,
                skin=config.skin, max_depth=config.max_depth,
                group_size=config.group_size,
                window_groups=config.window_groups,
                list_cap=config.list_capacity,
                worklist_budget=getattr(config, "worklist_budget", 0),
                wl_caps=tuple(getattr(config, "wl_caps", ()) or ()),
                quadrupole=quad,
                near_groups=getattr(config, "near_groups", 0),
                # The pool serves the default production path only: the
                # quadrupole rows, the near-group block reads, and the
                # XLA oracle eval all read the dense layout.
                pool_tile=(0 if (quad
                                 or getattr(config, "near_groups", 0)
                                 or not getattr(config,
                                                "use_pallas_eval", True))
                           else getattr(config, "pool_tile", 0)),
                pool_cap=getattr(config, "pool_cap", 0),
                emit_mode=getattr(config, "traversal_emit", "auto"),
                tree_caps=tuple(getattr(config, "tree_caps", ()) or ()))


# Above this body count the step splits into two device programs with the
# rebuild scheduled from the host: this image's TPU compile helper cannot
# build the combined rebuild+eval-chain program at 10M-body shapes (each
# half compiles fine on its own).
HOST_SCHEDULED_THRESHOLD = 4_000_000


def make_window_step(config, n: int, substeps: int = 1):
    """Production step with rebuild policy: (state, dt) -> state.

    Up to :data:`HOST_SCHEDULED_THRESHOLD` bodies this is ONE jitted
    program with the rebuild decision in-graph (``lax.cond`` per
    substep).  Beyond it, :func:`_make_host_scheduled_step` returns a
    host callable closing over two jits (rebuild, eval chain) — the
    rebuild then happens at frame boundaries (the recorder's natural
    cadence), up to ``substeps-1`` steps later than the in-graph policy
    would fire it.

    Rebuilds when ``steps_since >= rebuild_interval`` OR (drift mode
    "max") any body drifted more than ``skin/2`` since the last build.
    """
    from spatialsim_tpu.config.nbody import resolve_config
    config = resolve_config(config, n)
    if n > HOST_SCHEDULED_THRESHOLD:
        return _make_host_scheduled_step(config, n, substeps)
    kw = _build_kw(config)
    ekw = dict(G=config.G, softening=config.softening,
               group_size=config.group_size,
               window_groups=config.window_groups,
               use_pallas=getattr(config, "use_pallas_eval", True),
               far_tile=getattr(config, "eval_far_tile", 512),
               quadrupole=getattr(config, "use_quadrupole", False),
               tau_clamp=float(getattr(config, "advance_tau_clamp", 24)),
               gpp=getattr(config, "eval_groups_per_program", 4))
    damping = config.damping
    interval = config.rebuild_interval
    refresh_iv = getattr(config, "refresh_interval", 0)
    skin = config.skin
    drift_mode = getattr(config, "rebuild_drift_mode", "max")
    advance2 = getattr(config, "advance_order", 2) >= 2
    tau_clamp = ekw["tau_clamp"]

    def substep(state: WindowBHState, dt):
        lists = state.lists
        sb = (lists.steps_build if lists.steps_build is not None
              else lists.steps_since)
        need = sb >= interval
        if drift_mode == "max":
            drift = jnp.max(jnp.abs(state.pos - lists.ref_pos))
            need = need | (drift > skin * 0.5)

        def do_rebuild(args):
            pos, vel, mass, acc, lists = args
            # Re-sort the (nearly sorted) state and compose the
            # slot -> original-body mapping across builds.  The previous
            # step's accelerations feed the second-order entry advance.
            pos2, vel2, mass2, nl = _resort_state(
                pos, vel, mass, lists.order, lists.inv_order, kw,
                acc=acc if advance2 else None)
            # acc is returned un-resorted purely for branch shape parity:
            # eval_accel_sorted recomputes it (new layout) right below.
            return pos2, vel2, mass2, acc, nl

        def no_rebuild(args):
            if not refresh_iv:
                return args
            pos, vel, mass, acc, lists = args
            lists = jax.lax.cond(
                lists.steps_since >= refresh_iv,
                lambda ls: refresh_lists(
                    ls, pos, vel, mass,
                    acc if advance2 else None, dt, tau_clamp),
                lambda ls: ls, lists)
            return pos, vel, mass, acc, lists

        pos, vel, mass, _, lists = jax.lax.cond(
            need, do_rebuild, no_rebuild,
            (state.pos, state.vel, state.mass, state.acc, lists))
        acc = eval_accel_sorted(lists, pos, mass, dt, **ekw)
        pos, vel = integrate(pos, vel, acc, dt, damping)
        lists = lists._replace(
            steps_since=lists.steps_since + 1,
            steps_build=(None if lists.steps_build is None
                         else lists.steps_build + 1))
        # Keep the carry structure stable: acc only lives in the state
        # when the second-order advance consumes it.
        return WindowBHState(pos, vel, mass, lists,
                             acc if advance2 else None)

    def step(state, dt):
        def body(s, _):
            return substep(s, dt), None
        state, _ = jax.lax.scan(body, state, None, length=substeps)
        return state

    return jax.jit(step, donate_argnums=(0,))


def _make_host_scheduled_step(config, n: int, substeps: int):
    """Two-program step for EXTREME scales (see make_window_step).

    The rebuild check runs on the host before each frame (a scalar
    ``steps_since`` read; drift mode adds one tiny max-reduction), so
    each device program stays within the compile helper's limits.
    ``config`` is already resolved.
    """
    import numpy as np

    kw = _build_kw(config)
    ekw = dict(G=config.G, softening=config.softening,
               group_size=config.group_size,
               window_groups=config.window_groups,
               use_pallas=getattr(config, "use_pallas_eval", True),
               far_tile=getattr(config, "eval_far_tile", 512),
               quadrupole=getattr(config, "use_quadrupole", False),
               tau_clamp=float(getattr(config, "advance_tau_clamp", 24)),
               gpp=getattr(config, "eval_groups_per_program", 4))
    damping = config.damping
    interval = config.rebuild_interval
    refresh_iv = getattr(config, "refresh_interval", 0)
    skin = config.skin
    drift_mode = getattr(config, "rebuild_drift_mode", "max")
    advance2 = getattr(config, "advance_order", 2) >= 2
    tau_clamp = float(getattr(config, "advance_tau_clamp", 24))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rebuild(state: WindowBHState):
        lists = state.lists
        pos2, vel2, mass2, nl = _resort_state(
            state.pos, state.vel, state.mass, lists.order,
            lists.inv_order, kw, acc=state.acc if advance2 else None)
        return WindowBHState(pos2, vel2, mass2, nl, state.acc)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def refresh(state: WindowBHState, dt):
        nl = refresh_lists(state.lists, state.pos, state.vel, state.mass,
                           state.acc if advance2 else None, dt, tau_clamp)
        return state._replace(lists=nl)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chain(state: WindowBHState, dt):
        def body(carry, _):
            pos, vel, acc_prev, ss = carry
            # The entry advance needs tau to grow per substep.
            lists_i = state.lists._replace(steps_since=ss)
            acc = eval_accel_sorted(lists_i, pos, state.mass, dt, **ekw)
            pos, vel = integrate(pos, vel, acc, dt, damping)
            return (pos, vel, acc if advance2 else None, ss + 1), None
        (pos, vel, acc, ss), _ = jax.lax.scan(
            body, (state.pos, state.vel, state.acc,
                   state.lists.steps_since), None, length=substeps)
        lists = state.lists._replace(
            steps_since=ss,
            steps_build=(None if state.lists.steps_build is None
                         else state.lists.steps_build + substeps))
        return WindowBHState(pos, vel, state.mass, lists, acc)

    @jax.jit
    def max_drift(pos, ref):
        return jnp.max(jnp.abs(pos - ref))

    def step(state: WindowBHState, dt):
        sb = (state.lists.steps_build
              if state.lists.steps_build is not None
              else state.lists.steps_since)
        need = int(sb) >= interval
        if not need and drift_mode == "max":
            need = float(max_drift(state.pos, state.lists.ref_pos)) \
                > skin * 0.5
        if need:
            state = rebuild(state)
        elif refresh_iv and int(state.lists.steps_since) >= refresh_iv:
            state = refresh(state, dt)
        return chain(state, dt)

    return step


def _resort_state(pos, vel, mass, prev_order, prev_inv, kw, acc=None):
    """Rebuild lists from a sorted-layout state and re-sort it.

    ``prev_order``: (npad,) current slot -> ORIGINAL body id;
    ``prev_inv``: (n,) original id -> current slot.  build_lists returns
    a permutation relative to its INPUT layout; composing through the
    previous mapping keeps ``order``/``inv_order`` original-body-based so
    host-facing reads and frame capture stay stable across rebuilds.
    """
    n = pos.shape[1]
    nl = build_lists(pos, vel, mass, acc, **kw)
    o = nl.order                       # (npad,) new slot -> previous slot
    o_real = o[:n]                     # true permutation of [0, n)
    pos2 = pos[:, o_real]
    vel2 = vel[:, o_real]
    mass2 = mass[o_real]
    to_orig = prev_order[o]            # new slot -> original body id
    o_inv = jnp.zeros((n,), jnp.int32).at[o_real].set(
        jnp.arange(n, dtype=jnp.int32))
    inv_new = o_inv[prev_inv]          # original id -> new slot
    nl = nl._replace(order=to_orig, inv_order=inv_new, ref_pos=pos2)
    return pos2, vel2, mass2, nl


def init_window_state(pos, vel, mass, config, donate=False) -> WindowBHState:
    """Build lists from ORIGINAL-order inputs and return the sorted state.

    With ``advance_order >= 2`` the first build uses zero accelerations
    (first interval falls back to the ballistic advance); subsequent
    rebuilds use the previous step's accelerations carried in the state.

    ``donate=True`` donates ``pos``/``vel``/``mass`` to the first build
    — at EXTREME scale non-donated jit arguments stay pinned in HBM for
    the whole build execution (~2 GB at 50M), and the 50M first build is
    within ~1 GB of the chip's capacity (extreme_50m_v3.log).  The
    caller's arrays are invalidated; only use it when they are
    temporaries (scripts/extreme_run.py).  Donation is a no-op on CPU.
    """
    from spatialsim_tpu.config.nbody import resolve_config
    config = resolve_config(config, pos.shape[1])
    n = pos.shape[1]
    advance2 = getattr(config, "advance_order", 2) >= 2

    if donate:
        kw = _build_kw(config)

        def _init(pos, vel, mass):
            acc0 = jnp.zeros_like(pos) if advance2 else None
            lists = build_lists(pos, vel, mass, acc0, **kw)
            o_real = lists.order[:n]
            pos_s = pos[:, o_real]
            return (pos_s, vel[:, o_real], mass[o_real],
                    lists._replace(ref_pos=pos_s))

        pos_s, vel_s, mass_s, lists = jax.jit(
            _init, donate_argnums=(0, 1, 2))(pos, vel, mass)
        # ref_pos must be a distinct buffer (the step donates the whole
        # state pytree; donating one buffer twice is a runtime error) —
        # copy outside the jit so XLA cannot alias it back to pos_s.
        lists = lists._replace(ref_pos=jnp.copy(pos_s))
        return WindowBHState(pos_s, vel_s, mass_s, lists,
                             jnp.zeros_like(pos_s) if advance2 else None)

    acc0 = jnp.zeros_like(pos) if advance2 else None
    lists = build_lists(pos, vel, mass, acc0, **_build_kw(config))
    o_real = lists.order[:n]
    pos_s = pos[:, o_real]
    vel_s = vel[:, o_real]
    mass_s = mass[o_real]
    # ref_pos must be a distinct buffer: the step donates the whole state
    # pytree, and donating one buffer twice (pos aliasing ref_pos) is a
    # runtime error.
    lists = lists._replace(ref_pos=jnp.copy(pos_s))
    return WindowBHState(pos_s, vel_s, mass_s, lists,
                         jnp.zeros_like(pos_s) if advance2 else None)


def build_diagnostics(pos, vel, mass, config):
    """Rebuild instrumentation: per-level worklist demand + list stats.

    Host-side helper (not jitted into the step): returns a dict with the
    actual worklist sizes per level (vs their static caps), far-list
    occupancy and residual mass per group — the numbers that drive
    wl_caps/list_capacity tuning.
    """
    import numpy as np
    from spatialsim_tpu.config.nbody import resolve_config
    from spatialsim_tpu.ops.octree import level_capacity
    config = resolve_config(config, pos.shape[1])
    kw = _build_kw(config)
    n = pos.shape[1]
    gsz = kw["group_size"]
    max_depth = kw["max_depth"]
    npad = ((n + gsz - 1) // gsz) * gsz
    pad = npad - n
    n_levels = max_depth - 2 + 1
    ng = npad // gsz
    budget = kw["worklist_budget"] or _auto_budget(npad)
    if kw.get("wl_caps"):
        wl_caps = tuple(kw["wl_caps"])
    else:
        wl_caps = _default_wl_caps(ng, n_levels, budget,
                                   c0=level_capacity(2, npad))

    @jax.jit
    def run(pos, vel, mass):
        half = compute_bounds(pos)
        codes = morton_encode(pos, half, max_depth)
        order = jnp.argsort(codes).astype(jnp.int32)
        order_pad = jnp.concatenate(
            [order, jnp.broadcast_to(order[-1], (pad,))])
        s_codes = jnp.concatenate(
            [codes[order], jnp.broadcast_to(codes[order[-1]], (pad,))])
        s_pos = pos[:, order_pad]
        pad_mask = jnp.arange(npad) >= n
        s_mass = jnp.where(pad_mask, 0.0, mass[order_pad])
        s_vel = vel[:, order_pad]
        tree = build_octree(s_codes, s_pos, s_mass, half,
                            max_depth=max_depth, start_level=2, n=npad,
                            sorted_vel=s_vel,
                            with_quadrupole=kw["quadrupole"])
        gpos = s_pos.reshape(3, ng, gsz)
        bbox_min = jnp.min(gpos, axis=2).T
        bbox_max = jnp.max(gpos, axis=2).T
        K = kw["near_groups"]
        near = (_select_near_groups(bbox_min, bbox_max, K,
                                    kw["window_groups"], 0, ng)
                if K > 0 else jnp.zeros((ng, 0), jnp.int32))
        intervals = _covered_intervals(near, kw["window_groups"], 0, gsz)
        far, _fr, far_n, sls, sle, sl_n, res, wl = _traverse_global(
            tree, bbox_min, bbox_max, ng, theta=float(kw["theta"]),
            soft_sq=float(kw["softening"]) ** 2, skin=float(kw["skin"]),
            gsz=gsz, intervals=intervals,
            list_cap=kw["list_cap"], n_levels=n_levels, wl_caps=wl_caps,
            quadrupole=kw["quadrupole"])
        n_cells = jnp.stack([lv.n_cells for lv in tree.levels])
        return far_n, res, wl, n_cells, jnp.sum(s_mass)

    far_n, res, wl, n_cells, mass_sum = run(pos, vel, mass)
    far_n = np.asarray(far_n)
    wl = np.asarray(wl)
    return {
        "n_levels": n_levels,
        "wl_caps": list(wl_caps),
        "wl_sizes": wl[:n_levels].tolist(),
        "wl_demand": wl[n_levels:].tolist(),
        "far_n_mean": float(far_n.mean()),
        "far_n_max": int(far_n.max()),
        "far_n_p99": float(np.percentile(far_n, 99)),
        "list_cap": kw["list_cap"],
        "groups_at_cap": int((far_n >= kw["list_cap"] - 1).sum()),
        "ng": ng,
        "residual_mass_frac": float(np.asarray(res)[:, 0].sum()
                                    / max(float(mass_sum), 1e-30)),
        "cells_per_level": np.asarray(n_cells).tolist(),
    }


def _measure_tree_caps(config, pos, headroom=2.0):
    """One-time per-level occupancy count -> tight static tree caps.

    The octree's default slot counts are ``min(8^d, n)`` per level —
    safe, but the two deepest levels then carry ~n slots each against
    a few percent occupancy (1M galaxy depth 8: 37K/169K occupied of 1M
    slots), and every pooling pass, attribute pack and packed gather
    table pays the full static width (~250 ms of the 1M rebuild).  One
    sorted-prefix count per level on the actual initial conditions
    prices the real occupancy; ``headroom`` (2x) absorbs density drift
    over the run, and overflow beyond it degrades gracefully
    (ops/octree.build_octree docstring) rather than crashing.
    """
    import numpy as np
    kw = _build_kw(config)
    max_depth = kw["max_depth"]
    gsz = kw["group_size"]
    n = pos.shape[1]
    npad = ((n + gsz - 1) // gsz) * gsz
    n_levels = max_depth - 2 + 1
    from spatialsim_tpu.ops.octree import level_capacity

    @jax.jit
    def occ(pos):
        half = compute_bounds(pos)
        codes = jnp.sort(morton_encode(pos, half, max_depth))
        outs = []
        for li in range(n_levels):
            c = codes >> (3 * (max_depth - (2 + li)))
            outs.append(1 + jnp.sum((c[1:] != c[:-1]).astype(jnp.int32)))
        return jnp.stack(outs)

    occs = np.asarray(occ(pos))
    caps = []
    for li in range(n_levels):
        full = level_capacity(2 + li, npad)
        want = int(occs[li] * headroom) + 1024
        caps.append(int(min(full, -(-want // 1024) * 1024)))
    return tuple(caps)


def _traverse_probe(config, pos, vel, mass, wl_caps, count_emissions=False):
    """One traversal probe on real initial conditions.

    With ``count_emissions=False`` the emission/sliver phases are
    ablated (cheapest form) and the return is the stacked
    ``[fills | pre-clamp demands]`` vector (2*n_levels,).  With
    ``count_emissions=True`` the probe emits for real (ranges mode) and
    returns ``(wl, far_n, sl_n)`` — the STORED per-group entry counts
    that size the far pool.  ``config`` must be resolved and carry
    ``tree_caps``.
    """
    kw = _build_kw(config)
    n = pos.shape[1]
    gsz = kw["group_size"]
    max_depth = kw["max_depth"]
    npad = ((n + gsz - 1) // gsz) * gsz
    pad = npad - n
    n_levels = max_depth - 2 + 1
    ng = npad // gsz

    @functools.partial(jax.jit, static_argnames=("caps", "emits"))
    def run(pos, vel, mass, caps, emits):
        half = compute_bounds(pos)
        codes = morton_encode(pos, half, max_depth)
        order = jnp.argsort(codes).astype(jnp.int32)
        order_pad = jnp.concatenate(
            [order, jnp.broadcast_to(order[-1], (pad,))])
        s_codes = jnp.concatenate(
            [codes[order], jnp.broadcast_to(codes[order[-1]], (pad,))])
        s_pos = pos[:, order_pad]
        pad_mask = jnp.arange(npad) >= n
        s_mass = jnp.where(pad_mask, 0.0, mass[order_pad])
        tree = build_octree(s_codes, s_pos, s_mass, half,
                            max_depth=max_depth, start_level=2,
                            n=npad,
                            level_caps=tuple(kw.get("tree_caps", ())))
        gpos = s_pos.reshape(3, ng, gsz)
        bbox_min = jnp.min(gpos, axis=2).T
        bbox_max = jnp.max(gpos, axis=2).T
        near = jnp.zeros((ng, 0), jnp.int32)
        intervals = _covered_intervals(near, kw["window_groups"],
                                       0, gsz)
        out = _traverse_global(
            tree, bbox_min, bbox_max, ng, theta=float(kw["theta"]),
            soft_sq=float(kw["softening"]) ** 2,
            skin=float(kw["skin"]), gsz=gsz, intervals=intervals,
            list_cap=kw["list_cap"], n_levels=n_levels,
            wl_caps=caps, quadrupole=False, with_acc=False,
            with_ranges=True, emit_values=False,
            ablate=() if emits else ("emit", "sliver"))
        return (out[7], out[2], out[5]) if emits else out[7]

    import numpy as np
    out = run(pos, vel, mass, tuple(wl_caps), count_emissions)
    if count_emissions:
        return (np.asarray(out[0]), np.asarray(out[1]),
                np.asarray(out[2]))
    return np.asarray(out)


def calibrate_config(config, pos, vel, mass, rounds=3, headroom=1.5):
    """Demand-calibrate per-level worklist caps on real initial conditions.

    The default caps follow the measured 1M GALAXY demand profile
    (:func:`_default_wl_caps`); isotropic dense distributions (Plummer
    cluster) demand 2-6x more at the SHALLOW levels, and a clamped level
    force-emits whole subtrees as coarse monopoles — measured 10% MEDIAN
    relative force error on the 100K cluster, invariant to max_depth and
    list capacity (scripts/decide20.py, round 4; this was the 10M
    rms-0.86 tail).  Replaces the reference's unbounded per-node
    recursion (reference nbody/simulation.py builds lists dynamically).

    Runs an emission-free traversal probe (``ablate=("emit",
    "sliver")``), grows every level whose pre-clamp demand exceeds its
    cap (iterating up to ``rounds``: folding undercounts deeper demand),
    and returns ``config.replace(wl_caps=..., worklist_budget=...)``.
    Growth is bounded by exact limits — level ``li`` cannot demand more
    than ``ng * cells(level)`` or 8x the previous cap — and a 48M hard
    per-level ceiling.  Caps never shrink below the defaults.  No-op
    (returns ``config`` unchanged) when the defaults already fit.
    """
    import numpy as np
    from spatialsim_tpu.config.nbody import resolve_config
    from spatialsim_tpu.ops.octree import level_capacity
    config = resolve_config(config, pos.shape[1])
    if not getattr(config, "tree_caps", ()):
        config = config.replace(tree_caps=_measure_tree_caps(config, pos))
    if getattr(config, "wl_caps", ()):
        return config
    kw = _build_kw(config)
    n = pos.shape[1]
    gsz = kw["group_size"]
    npad = ((n + gsz - 1) // gsz) * gsz
    n_levels = kw["max_depth"] - 2 + 1
    ng = npad // gsz
    budget = kw["worklist_budget"] or _auto_budget(npad)
    defaults = _default_wl_caps(ng, n_levels, budget,
                                c0=level_capacity(2, npad))

    def probe(wl_caps):
        return _traverse_probe(config, pos, vel, mass, wl_caps)

    # HBM-derived per-level ceiling: the traversal's live set per slot
    # is ~30-40 f32/int32 columns (cell attrs + group bounds + interval
    # pack + emission columns), call it 200 B with scatter targets and
    # allocator slack.  Unbounded demand-growth OOM'd the 10M cluster
    # on the v5e (calibrated deep caps 21M/40M -> ResourceExhausted,
    # docs/measurements_r4/decide20_v2.log); the deep levels are also
    # the least accuracy-critical (leaf-scale folds), so the ceiling
    # clamps them while the shallow clamps — the measured source of the
    # rms-0.9 tail — are granted in full (their demand is ~100x
    # smaller).  The HBM size comes from the device itself
    # (memory_stats) so a 95 GB v5p is not clamped to a v5e's budget;
    # 13 GB is only the fallback when the runtime reports nothing.
    #
    # The DEEPEST TWO levels never grow past their defaults at all:
    # granting them lvl_ceil each (14.75M + 14.75M at 10M) pushed the
    # cap sum to 53.5M slots and the run into ResourceExhausted at the
    # first rebuild even WITH the ceiling (docs/measurements_r5/
    # diag10m.log), while deep-level folding is the measured-gentle
    # error case (leaf-scale monopoles; scripts/nbody_error.py
    # 2026-08-17) — the rms-0.9 cluster tail came from the SHALLOW
    # clamps, which stay granted in full.
    usable = _device_hbm_bytes() - 120.0 * n
    lvl_ceil = int(max(8_000_000, usable * 0.25 / 200.0))
    HARD_CEIL = min(48_000_000, lvl_ceil)
    lvl_ceils = [HARD_CEIL] * n_levels
    for li in range(max(0, n_levels - 2), n_levels):
        lvl_ceils[li] = min(HARD_CEIL, defaults[li])
    caps = list(defaults)
    grown = False
    for _ in range(max(1, rounds)):
        wl = probe(caps)
        demand = wl[n_levels:]
        clamped = [int(demand[li]) > caps[li]
                   and caps[li] < min(lvl_ceils[li],
                                      ng * level_capacity(li + 2, npad))
                   for li in range(n_levels)]
        if not any(clamped):
            break
        new = []
        for li in range(n_levels):
            exact = ng * level_capacity(li + 2, npad)
            if li > 0:
                exact = min(exact, 8 * new[li - 1])
            tgt = max(caps[li], int(int(demand[li]) * headroom))
            tgt = -(-tgt // 1024) * 1024
            new.append(int(max(caps[li],
                               min(max(tgt, ng * 8), exact,
                                   lvl_ceils[li]))))
        new[0] = max(new[0], ng * level_capacity(2, npad))
        if new == caps:
            # A level can stay "clamped" (demand > cap) while its growth
            # is bound by the 8x-parent chain — without this break the
            # loop would burn every remaining round (each a full probe
            # build, ~minutes at 10M) making no progress.
            break
        grown = True
        caps = new
    if not grown:
        return config
    config = config.replace(wl_caps=tuple(caps))
    # Pool sizing: the exact caps_total bound is wildly pessimistic on
    # grown caps (53.5M slots -> a 3.65 GB pool at 10M whose finish
    # transients OOM'd HBM, diag10m.log) — size it from a COUNTED
    # emissions probe instead, x1.5 drift headroom.  Cumulative
    # overflow beyond the static cap folds whole groups into their
    # mass-conserving residuals (the graceful path, _finish_pool_*).
    tile = kw["pool_tile"]
    if tile and not getattr(config, "pool_cap", 0):
        _, far_n, sl_n = _traverse_probe(config, pos, vel, mass,
                                         tuple(caps),
                                         count_emissions=True)
        need = int(np.sum(
            (far_n.astype(np.int64) + sl_n + 1 + tile - 1) // tile))
        exact = int(sum(caps) + ng * (SLIVER_CAP + 1)) // tile + ng + 1
        config = config.replace(
            pool_cap=min(int(need * 1.5) + ng + 1, exact))
    return config


def window_bh_accel(pos, vel, mass, config, dt=0.0, use_pallas=None):
    """One-shot accelerations (fresh lists) — the testing entry point."""
    from spatialsim_tpu.config.nbody import resolve_config
    config = resolve_config(config, pos.shape[1])
    if use_pallas is None:
        use_pallas = getattr(config, "use_pallas_eval", True)
    kw = _build_kw(config)
    if not use_pallas:
        kw["pool_tile"] = 0    # the XLA oracle reads the dense layout
    lists = build_lists(pos, vel, mass, **kw)
    return eval_accel(lists, pos, mass, jnp.float32(dt), G=config.G,
                      softening=config.softening,
                      group_size=config.group_size,
                      window_groups=config.window_groups,
                      use_pallas=use_pallas,
                      quadrupole=getattr(config, "use_quadrupole", False))
