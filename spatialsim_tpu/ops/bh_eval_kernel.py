"""Pallas kernel for the windowed-BH per-step force evaluation.

Replaces the XLA dense evaluation in :mod:`spatialsim_tpu.ops.bh_window`
(measured ~84 ms/step at 1M bodies) with a single fused kernel per batch
of ``gpp`` groups:

* each program evaluates ``gpp`` consecutive Morton groups (batching
  amortizes the per-program dispatch/pipeline overhead — at 1M bodies a
  grid of 3907 single-group programs left ~15 ms of fixed cost);
* everything stays lanes-major: the window arrives as ``gpp + 2*wg``
  ``(8, gsz)`` block views of the padded sorted array, group j's own
  bodies ARE view j+wg (one small in-kernel transpose puts targets on
  sublanes), and the output is written ``(8, gpp*gsz)`` — a bodies-major
  ``(npad, 8)`` array would pad 8 -> 128 lanes, a 16x HBM blowup that
  OOMs at 10M bodies;
* far entries stream from a per-group row of the ``(gpp, R, L)`` VMEM
  block in tiles, and the tile loop is bounded by the group's ACTUAL
  entry count (scalar prefetch) — padding tiles are skipped, not masked;
* pairwise math uses direct coordinate differences (exact in fp for
  nearby magnitudes — no cancellation, no centering needed) and the
  reference force law ``w = m/dist³`` gated by ``dist² > softening²``
  (reference ``nbody/simulation.py:247-266``); G is folded in once at the
  end.  R == 16 rows additionally carry the traceless quadrupole
  (stored far_layout rows, advanced in-kernel): a ≈ m·d/r³ − (Q·d)/r⁵ + (5/2)(dᵀQd)d/r⁷.

The pure-XLA path remains in bh_window.py as the fallback/oracle; the two
are asserted equal in tests/test_bh_window.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Lanes per group in the pre-transposed-targets array: x/y/z + 13 pad.
# The array is PER-PROGRAM ALIGNED — program p's gpp groups sit at block
# column p, each 16 lanes, width rounded up to Mosaic's 128-lane block
# rule — so every in-kernel target read is a STATIC slice (dynamic
# lane-dim offsets fail to compile; measured round 3, decide6).
TGT_LANES = 16


def _tgt_width(gpp: int) -> int:
    return ((TGT_LANES * gpp + 127) // 128) * 128


def _pair_accum(xi, yi, zi, xj, yj, zj, mj, soft_sq):
    """Accumulate monopole forces of sources j onto bodies i.

    xi/yi/zi: (gsz, 1); xj/yj/zj/mj: (1, S).  Returns ax, ay, az (gsz, 1).
    """
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    dist_sq = dx * dx + dy * dy + dz * dz + soft_sq
    inv = jax.lax.rsqrt(dist_sq)
    w = jnp.where(dist_sq > soft_sq, mj * (inv * inv * inv), 0.0)
    return (jnp.sum(w * dx, axis=1, keepdims=True),
            jnp.sum(w * dy, axis=1, keepdims=True),
            jnp.sum(w * dz, axis=1, keepdims=True))


def _pair_accum_quad(xi, yi, zi, xj, yj, zj, mj, q6, soft_sq):
    """Monopole + traceless-quadrupole forces of frozen entries j onto i.

    a += m·d/r³ − (Q·d)/r⁵ + (5/2)(dᵀQd)·d/r⁷ with d = source − target
    (the −∇ of Φ = −[m/r + dᵀQd/(2r⁵)]; matches
    spatialsim_tpu.ops.bh_window._dense_accel_quad, tested equal).
    q6 rows: qxx, qyy, qzz, qxy, qxz, qyz — each (1, S).
    """
    qxx, qyy, qzz, qxy, qxz, qyz = q6
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    dist_sq = dx * dx + dy * dy + dz * dz + soft_sq
    gate = dist_sq > soft_sq
    inv = jax.lax.rsqrt(dist_sq)
    inv2 = inv * inv
    inv3 = jnp.where(gate, inv * inv2, 0.0)
    qdx = qxx * dx + qxy * dy + qxz * dz
    qdy = qxy * dx + qyy * dy + qyz * dz
    qdz = qxz * dx + qyz * dy + qzz * dz
    dqd = dx * qdx + dy * qdy + dz * qdz
    inv5 = inv3 * inv2
    cw = mj * inv3 + 2.5 * dqd * inv5 * inv2
    return (jnp.sum(cw * dx - inv5 * qdx, axis=1, keepdims=True),
            jnp.sum(cw * dy - inv5 * qdy, axis=1, keepdims=True),
            jnp.sum(cw * dz - inv5 * qdz, axis=1, keepdims=True))


def _mxu_accum(tgt_c, ti_sq, src_c, m_row, wp, ws, soft_sq):
    """MXU-form monopole accumulation of sources onto targets.

    a_i = G·(Σ_j w_ij·s_j − p_i·Σ_j w_ij) with w = m/dist³ — both
    contractions ride the MXU, leaving ~8 VPU ops/pair vs the 17 of the
    direct-difference form (the measured eval is VPU-bound).  dist² uses
    |p|² + |s|² − 2p·s on GROUP-CENTRED coordinates (f32-safe; the cross
    term runs at precision HIGHEST so no bf16 truncation enters).  The
    reference's self/coincident-pair gate (nbody/simulation.py:245,260)
    is algebraically built in: a w_ij with s_j == p_i contributes
    exactly 0 to wp − p·ws.

    tgt_c (iblk, 3); ti_sq (iblk, 1); src_c (3, S); m_row (1, S).
    Returns updated (wp (iblk, 3), ws (iblk, 1)).
    """
    hi = jax.lax.Precision.HIGHEST
    ps_sq = jnp.sum(src_c * src_c, axis=0, keepdims=True)       # (1, S)
    cross = jax.lax.dot_general(
        tgt_c, src_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi)       # (iblk, S)
    d2 = ti_sq + ps_sq - 2.0 * cross + soft_sq
    inv = jax.lax.rsqrt(jnp.maximum(d2, soft_sq))
    w = m_row * (inv * inv * inv)                               # (iblk, S)
    wp = wp + jax.lax.dot_general(
        w, src_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi)       # (iblk, 3)
    ws = ws + jnp.sum(w, axis=1, keepdims=True)
    return wp, ws


def _advanced_tile(ref, row, off, tile, adv_ref):
    """Frozen-entry tile advanced IN-KERNEL to the current τ.

    ``ref`` holds the RAW stored rows (far_layout): reading them here and
    applying com + v·τ (+ a·coef₂) on the fly replaces the round-2
    ``far_eval_tensor`` pre-materialization — ~1.3 GB of HBM round-trip
    per step at 1M (and a tensor-sized transient at EXTREME scales) for
    ~6 VPU ops per ENTRY (not per pair; the advance hoists above the
    target-block loop).  ``adv_ref``: (1, 2) SMEM [τ, coef₂] with
    coef₂ = t_c·τ − t_c²/2 (the clamped quadratic term).

    Returns (fx, fy, fz, fm, q6|None) as (1, tile) rows.
    """
    R = ref.shape[1]
    quad = R in (13, 16)
    acc0 = (13 if quad else 7) if R in (10, 16) else None
    tau = adv_ref[0, 0]
    fx = ref[row, 0:1, pl.ds(off, tile)] + ref[row, 3:4, pl.ds(off, tile)] * tau
    fy = ref[row, 1:2, pl.ds(off, tile)] + ref[row, 4:5, pl.ds(off, tile)] * tau
    fz = ref[row, 2:3, pl.ds(off, tile)] + ref[row, 5:6, pl.ds(off, tile)] * tau
    if acc0 is not None:
        c2 = adv_ref[0, 1]
        fx = fx + ref[row, acc0:acc0 + 1, pl.ds(off, tile)] * c2
        fy = fy + ref[row, acc0 + 1:acc0 + 2, pl.ds(off, tile)] * c2
        fz = fz + ref[row, acc0 + 2:acc0 + 3, pl.ds(off, tile)] * c2
    fm = ref[row, 6:7, pl.ds(off, tile)]
    q6 = (tuple(ref[row, 7 + k:8 + k, pl.ds(off, tile)] for k in range(6))
          if quad else None)
    return fx, fy, fz, fm, q6


def _accum_cols(colr, xi, yi, zi, acc, soft_sq, sc, n_chunks):
    """Accumulate column-chunked sources onto lane-resident targets.

    ``colr``: (S, 8) VMEM scratch REF with columns [x, y, z, m] (a
    transposed source block — Mosaic has no dynamic_slice on values, so
    the transpose is staged through scratch and chunks are ``pl.ds`` ref
    reads); ``xi``/``yi``/``zi``: (1, T) target rows; ``acc``: three
    (sc, T) running sums.  Each chunk is ``sc`` sources broadcast across
    lanes against T targets broadcast across sublanes — every pair op is
    elementwise on (sc, T) tiles, no reductions inside the loop (the
    caller reduces the sc sublanes once at the very end).
    """
    def chunk(c, carry):
        ax, ay, az = carry
        s = colr[pl.ds(c * sc, sc), :]
        dx = s[:, 0:1] - xi
        dy = s[:, 1:2] - yi
        dz = s[:, 2:3] - zi
        d2 = dx * dx + dy * dy + dz * dz + soft_sq
        inv = jax.lax.rsqrt(d2)
        w = jnp.where(d2 > soft_sq, s[:, 3:4] * (inv * inv * inv), 0.0)
        return ax + w * dx, ay + w * dy, az + w * dz
    return jax.lax.fori_loop(0, n_chunks, chunk, acc)


def _eval_kernel_cols(adv_ref, far_n_ref, *rest, soft_sq, G,
                      gsz, far_tile, n_views, gpp, wg,
                      n_near=0, sc=8):
    """Column-source variant of :func:`_eval_kernel` (monopole lists).

    The row-source kernel puts targets on sublanes and sources on lanes,
    so every (target-block, source-tile) interaction ends in three
    cross-lane reductions over the source axis — and measured ~4x off
    VPU peak at 1M bodies.  Here sources ride SUBLANES ((sc, 1) columns
    of a transposed source block) and targets ride LANES ((1, gsz) rows
    read straight from the (8, gsz) window view), so the pair loop is
    pure elementwise FMAs into (sc, gsz) running accumulators.  The only
    non-elementwise work is one (8, S) transpose per source block
    (amortized over S/sc chunks) and a single sublane reduction per
    component at the end of each group.
    """
    window_refs = rest[:n_views]
    near_refs = rest[n_views + 1:n_views + 1 + gpp * n_near]
    far_ref = rest[n_views + 1 + gpp * n_near]
    out_ref = rest[n_views + 1 + gpp * n_near + 1]
    colr = rest[n_views + 1 + gpp * n_near + 2]  # (max(gsz, tile), 8) VMEM

    p = pl.program_id(0)
    n_window = 2 * wg + 1
    # Lane-block the target axis so live (sc, TL) temporaries stay within
    # the register budget at large group sizes.
    TL = min(gsz, 512)

    for j in range(gpp):
        base = j * gsz
        g = p * gpp + j
        tref = window_refs[j + wg]
        for b in range(0, gsz, TL):
            xi = tref[0:1, b:b + TL]
            yi = tref[1:2, b:b + TL]
            zi = tref[2:3, b:b + TL]
            acc = (jnp.zeros((sc, TL), jnp.float32),
                   jnp.zeros((sc, TL), jnp.float32),
                   jnp.zeros((sc, TL), jnp.float32))
            for k in range(n_window):
                colr[0:gsz, :] = window_refs[j + k][:].T
                acc = _accum_cols(colr, xi, yi, zi, acc, soft_sq, sc,
                                  gsz // sc)
            for k in range(n_near):
                colr[0:gsz, :] = near_refs[j * n_near + k][:].T
                acc = _accum_cols(colr, xi, yi, zi, acc, soft_sq, sc,
                                  gsz // sc)

            def list_loop(ref, row, count, acc):
                tile = min(far_tile, ref.shape[2])
                n_tiles = (count + tile - 1) // tile

                def tile_body(t, acc):
                    off = pl.multiple_of(t * tile, tile)
                    fx, fy, fz, fm, _ = _advanced_tile(
                        ref, row, off, tile, adv_ref)
                    colr[0:tile, :] = jnp.concatenate(
                        [fx, fy, fz, fm,
                         jnp.zeros((4, tile), jnp.float32)], axis=0).T
                    return _accum_cols(colr, xi, yi, zi, acc, soft_sq,
                                       sc, tile // sc)

                return jax.lax.fori_loop(0, n_tiles, tile_body, acc)

            acc = list_loop(far_ref, j, far_n_ref[g], acc)

            ax, ay, az = acc
            out_ref[0:3, base + b:base + b + TL] = jnp.concatenate(
                [jnp.sum(ax, axis=0, keepdims=True),
                 jnp.sum(ay, axis=0, keepdims=True),
                 jnp.sum(az, axis=0, keepdims=True)], axis=0) * G


def _eval_kernel_mxu(adv_ref, far_n_ref, *rest, soft_sq, G,
                     gsz, far_tile, n_views, gpp, wg, n_near=0):
    """MXU variant of :func:`_eval_kernel` (monopole lists only)."""
    window_refs = rest[:n_views]
    tgtT_ref = rest[n_views]
    near_refs = rest[n_views + 1:n_views + 1 + gpp * n_near]
    far_ref = rest[n_views + 1 + gpp * n_near]
    out_ref = rest[n_views + 1 + gpp * n_near + 1]

    p = pl.program_id(0)
    n_window = 2 * wg + 1

    for j in range(gpp):
        g = p * gpp + j
        base = j * gsz
        tgt8 = window_refs[j + wg][:]                  # (8, gsz)
        center = jnp.mean(tgt8[0:3, :], axis=1, keepdims=True)  # (3, 1)
        c0 = TGT_LANES * j
        iblk = min(gsz, 512)
        for i0 in range(0, gsz, iblk):
            tgt_c = (tgtT_ref[i0:i0 + iblk, c0:c0 + 3]
                     - center.T)                               # (iblk, 3)
            ti_sq = jnp.sum(tgt_c * tgt_c, axis=1, keepdims=True)
            wp = jnp.zeros((iblk, 3), jnp.float32)
            ws = jnp.zeros((iblk, 1), jnp.float32)

            for k in range(n_window):
                wref = window_refs[j + k]
                wp, ws = _mxu_accum(tgt_c, ti_sq, wref[0:3, :] - center,
                                    wref[3:4, :], wp, ws, soft_sq)
            # Spatial neighbour groups (exact near field, like the
            # window): block views selected by the scalar-prefetch table.
            for k in range(n_near):
                nref = near_refs[j * n_near + k]
                wp, ws = _mxu_accum(tgt_c, ti_sq, nref[0:3, :] - center,
                                    nref[3:4, :], wp, ws, soft_sq)

            def list_loop(ref, row, count, carry):
                tile = min(far_tile, ref.shape[2])
                n_tiles = (count + tile - 1) // tile

                def tile_body(t, carry):
                    wp, ws = carry
                    off = pl.multiple_of(t * tile, tile)
                    fx, fy, fz, fm, _ = _advanced_tile(
                        ref, row, off, tile, adv_ref)
                    src_c = jnp.concatenate([fx, fy, fz], axis=0) - center
                    return _mxu_accum(tgt_c, ti_sq, src_c, fm, wp, ws,
                                      soft_sq)

                return jax.lax.fori_loop(0, n_tiles, tile_body, carry)

            wp, ws = list_loop(far_ref, j, far_n_ref[g], (wp, ws))

            acc3 = (wp - tgt_c * ws) * G                        # (iblk, 3)
            out_ref[0:3, base + i0:base + i0 + iblk] = acc3.T


def _eval_kernel_pool(adv_ref, pstart_ref, far_n_ref, *rest, soft_sq, G,
                      gsz, tile, n_views, gpp, wg, iblk=0):
    """Pool-compacted variant of :func:`_eval_kernel`.

    Far entries stream from the HBM tile pool with double-buffered
    manual DMA — only ceil(far_n/tile) tiles per group move, vs the
    dense path's whole (R, L) fixed-cap block (~4-5x the bytes at 1M).
    The far loop is hoisted OUT of the target-block loop (a tile is
    DMA'd once and applied to every i-block); window/target structure
    matches :func:`_eval_kernel` (staged span + MXU target transpose).
    Monopole only.
    """
    window_refs = rest[:n_views]
    pool_ref = rest[n_views]
    out_ref = rest[n_views + 1]
    wspan = rest[n_views + 2]
    bufs = rest[n_views + 3]          # (2, POOL_ROWS, tile) VMEM
    sems = rest[n_views + 4]          # (2,) DMA semaphores

    p = pl.program_id(0)
    n_window = 2 * wg + 1
    if not iblk:
        iblk = min(gsz, 512 if gsz <= 512 else 256)
    nblk = gsz // iblk

    for k in range(n_views):
        wspan[:, k * gsz:(k + 1) * gsz] = window_refs[k][:]

    ii = jax.lax.broadcasted_iota(jnp.int32, (gsz, gsz), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (gsz, gsz), 1)
    eye = jnp.where(ii == jj, 1.0, 0.0).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    for j in range(gpp):
        g = p * gpp + j
        base = j * gsz
        tgtT = jax.lax.dot_general(
            eye, window_refs[j + wg][0:3, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)

        tg = [(tgtT[i0:i0 + iblk, 0:1], tgtT[i0:i0 + iblk, 1:2],
               tgtT[i0:i0 + iblk, 2:3])
              for i0 in range(0, gsz, iblk)]
        accs = tuple(jnp.zeros((iblk, 1), jnp.float32)
                     for _ in range(3 * nblk))

        # Window: same staged-span fori_loop as the dense kernel.
        def win_body(k, accs, j=j, tg=tg):
            off = pl.multiple_of((j + k) * gsz, gsz)
            sx = wspan[0:1, pl.ds(off, gsz)]
            sy = wspan[1:2, pl.ds(off, gsz)]
            sz = wspan[2:3, pl.ds(off, gsz)]
            sm = wspan[3:4, pl.ds(off, gsz)]
            out = []
            for bi, (xi, yi, zi) in enumerate(tg):
                dax, day, daz = _pair_accum(xi, yi, zi, sx, sy, sz, sm,
                                            soft_sq)
                out += [accs[3 * bi] + dax, accs[3 * bi + 1] + day,
                        accs[3 * bi + 2] + daz]
            return tuple(out)

        accs = jax.lax.fori_loop(0, n_window, win_body, accs)

        # Far pool: double-buffered tile stream, one DMA per tile.
        t0 = pstart_ref[g]
        n_t = (far_n_ref[g] + tile - 1) // tile
        # Hard in-bounds clamp: a pool-capacity overflow at build time
        # folds whole groups to residuals (bh_window._finish_pool_ranges)
        # so indices should never exceed the cap — but an out-of-bounds
        # DMA is an unrecoverable device INTERNAL error (observed at 20M
        # round 4), so the last tile is the floor either way.
        t_max = pool_ref.shape[0] - 1

        def start(t, t0=t0):
            slot = jax.lax.rem(t, 2)
            src = jnp.minimum(t0 + t, t_max)
            pltpu.make_async_copy(pool_ref.at[src], bufs.at[slot],
                                  sems.at[slot]).start()

        @pl.when(n_t > 0)
        def _():
            start(0)

        def far_body(t, accs, t0=t0, n_t=n_t, tg=tg):
            slot = jax.lax.rem(t, 2)
            src = jnp.minimum(t0 + t, t_max)
            pltpu.make_async_copy(pool_ref.at[src], bufs.at[slot],
                                  sems.at[slot]).wait()

            @pl.when(t + 1 < n_t)
            def _():
                start(t + 1)

            tau = adv_ref[0, 0]
            c2 = adv_ref[0, 1]
            fx = (bufs[slot, 0:1, :] + bufs[slot, 3:4, :] * tau
                  + bufs[slot, 7:8, :] * c2)
            fy = (bufs[slot, 1:2, :] + bufs[slot, 4:5, :] * tau
                  + bufs[slot, 8:9, :] * c2)
            fz = (bufs[slot, 2:3, :] + bufs[slot, 5:6, :] * tau
                  + bufs[slot, 9:10, :] * c2)
            fm = bufs[slot, 6:7, :]
            out = []
            for bi, (xi, yi, zi) in enumerate(tg):
                dax, day, daz = _pair_accum(xi, yi, zi, fx, fy, fz, fm,
                                            soft_sq)
                out += [accs[3 * bi] + dax, accs[3 * bi + 1] + day,
                        accs[3 * bi + 2] + daz]
            return tuple(out)

        accs = jax.lax.fori_loop(0, n_t, far_body, accs)

        for bi, i0 in enumerate(range(0, gsz, iblk)):
            acc3 = jnp.concatenate(
                [accs[3 * bi] * G, accs[3 * bi + 1] * G,
                 accs[3 * bi + 2] * G], axis=1)
            out_ref[0:3, base + i0:base + i0 + iblk] = acc3.T


def _eval_kernel(adv_ref, far_n_ref, *rest, soft_sq, G, gsz,
                 far_tile, n_views, gpp, wg, n_near=0,
                 iblk=0, dbg="", tgt_mode="mxu"):
    nt = 1 if tgt_mode == "pre" else 0
    window_refs = rest[:n_views]
    tgtT_ref = rest[n_views] if nt else None
    near_refs = rest[n_views + nt:n_views + nt + gpp * n_near]
    far_ref = rest[n_views + nt + gpp * n_near]
    out_ref = rest[n_views + nt + gpp * n_near + 1]
    wspan = rest[n_views + nt + gpp * n_near + 2]  # (8, n_views*gsz) VMEM

    p = pl.program_id(0)
    n_window = 2 * wg + 1

    if tgt_mode == "mxu":
        # Targets transposed IN-KERNEL on the MXU: T = E @ viewᵀ with E
        # the identity — 4 MXU passes per group at HIGHEST precision
        # (bf16x3 recombination is EXACT for f32).  Mosaic lowers plain
        # sublane<->lane transposes element-by-element (~25-30 ms/eval
        # at 1M whether in-kernel or as the XLA pre-transpose, measured
        # decide5-9) — the systolic array does the same data movement in
        # ~2 ms.
        ii = jax.lax.broadcasted_iota(jnp.int32, (gsz, gsz), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (gsz, gsz), 1)
        eye = jnp.where(ii == jj, 1.0, 0.0).astype(jnp.float32)

    # Stage the window views into ONE contiguous VMEM span so the
    # window loop below is STRUCTURALLY IDENTICAL to the far-list tile
    # loop (fori_loop + (1, gsz) row reads at pl.ds offsets).  Measured
    # round 3 (decide5/6): the far loop runs at ~10 ps/pair while the
    # unrolled per-view-ref window path pays ~66 ps/pair for the same
    # _pair_accum math — whatever Mosaic does differently for the
    # blockspec-view reads, mirroring the fast structure sidesteps it.
    if "nostage" not in dbg:
        for k in range(n_views):
            wspan[:, k * gsz:(k + 1) * gsz] = window_refs[k][:]

    # Targets come from the PRE-TRANSPOSED per-program-aligned block —
    # measured round 3 (scripts/decide5.py): the in-kernel (8, gsz).T
    # per group was ~80% of eval cost (sublane<->lane transposes are
    # element-by-element on Mosaic; 15.6K of them per eval at 1M).  One
    # XLA transpose outside the kernel replaces them all; every read
    # below is a static slice of this program's own (gsz, width) block.
    for j in range(gpp):
        g = p * gpp + j
        base = j * gsz
        c0 = TGT_LANES * j if nt else 0
        if tgt_mode == "mxu" and "notgt" not in dbg:
            hi = jax.lax.Precision.HIGHEST
            tgtT = jax.lax.dot_general(
                eye, window_refs[j + wg][0:3, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=hi)                          # (gsz, 3)
        # Sub-tile the i (target body) dimension so the (i, source)
        # pairwise intermediates stay within VMEM for large group sizes
        # (the (iblk, W) temporaries are the kernel's VMEM high-water
        # mark; at gsz 1024 an iblk of 512 overflows the Mosaic budget).
        if not iblk:
            iblk = min(gsz, 512 if gsz <= 512 else 256)
        for i0 in range(0, gsz, iblk):
            if "notgt" in dbg:
                xi = jnp.zeros((iblk, 1), jnp.float32)
                yi = jnp.zeros((iblk, 1), jnp.float32)
                zi = jnp.full((iblk, 1), 0.5, jnp.float32)
            elif tgt_mode == "mxu":
                xi = tgtT[i0:i0 + iblk, 0:1]
                yi = tgtT[i0:i0 + iblk, 1:2]
                zi = tgtT[i0:i0 + iblk, 2:3]
            else:
                xi = tgtT_ref[i0:i0 + iblk, c0:c0 + 1]
                yi = tgtT_ref[i0:i0 + iblk, c0 + 1:c0 + 2]
                zi = tgtT_ref[i0:i0 + iblk, c0 + 2:c0 + 3]

            ax = jnp.zeros((iblk, 1), jnp.float32)
            ay = jnp.zeros((iblk, 1), jnp.float32)
            az = jnp.zeros((iblk, 1), jnp.float32)

            # Near field: group j's Morton window = span tiles j..j+2wg,
            # iterated exactly like the far tiles (see staging note
            # above).
            def win_body(k, carry):
                ax, ay, az = carry
                off = pl.multiple_of((j + k) * gsz, gsz)
                dax, day, daz = _pair_accum(
                    xi, yi, zi,
                    wspan[0:1, pl.ds(off, gsz)],
                    wspan[1:2, pl.ds(off, gsz)],
                    wspan[2:3, pl.ds(off, gsz)],
                    wspan[3:4, pl.ds(off, gsz)], soft_sq)
                return ax + dax, ay + day, az + daz

            if "nowin" not in dbg:
                ax, ay, az = jax.lax.fori_loop(0, n_window, win_body,
                                               (ax, ay, az))
            for k in range(n_near):
                nref = near_refs[j * n_near + k]
                dax, day, daz = _pair_accum(
                    xi, yi, zi, nref[0:1, :], nref[1:2, :], nref[2:3, :],
                    nref[3:4, :], soft_sq)
                ax += dax
                ay += day
                az += daz

            def list_loop(ref, row, count, carry):
                # Frozen-entry tiles, bounded by the actual entry count;
                # entries advance to the current τ in-register.
                tile = min(far_tile, ref.shape[2])
                n_tiles = (count + tile - 1) // tile
                quad = ref.shape[1] in (13, 16)

                def tile_body(t, carry):
                    ax, ay, az = carry
                    off = pl.multiple_of(t * tile, tile)
                    fx, fy, fz, fm, q6 = _advanced_tile(
                        ref, row, off, tile, adv_ref)
                    if quad:
                        dax, day, daz = _pair_accum_quad(
                            xi, yi, zi, fx, fy, fz, fm, q6, soft_sq)
                    else:
                        dax, day, daz = _pair_accum(
                            xi, yi, zi, fx, fy, fz, fm, soft_sq)
                    return ax + dax, ay + day, az + daz

                return jax.lax.fori_loop(0, n_tiles, tile_body, carry)

            ax, ay, az = list_loop(far_ref, j, far_n_ref[g], (ax, ay, az))

            if "nouttr" in dbg:
                # Keep the dependency on the accumulators but skip the
                # (iblk, 3) -> (3, iblk) output transpose (decomposition
                # probe).
                s = jnp.sum(ax + ay + az) * G
                out_ref[0:3, base + i0:base + i0 + iblk] = jnp.full(
                    (3, iblk), 0.0, jnp.float32) + s
            else:
                acc3 = jnp.concatenate([ax * G, ay * G, az * G], axis=1)
                out_ref[0:3, base + i0:base + i0 + iblk] = acc3.T


@functools.partial(
    jax.jit,
    static_argnames=("G", "softening", "group_size", "window_groups",
                     "groups_per_program", "tau_clamp", "iblk"))
def pallas_window_eval_pool(s_pos, s_mass, pool, pstart, far_n,
                            steps_since, dt, *, G, softening,
                            group_size=256, window_groups=2,
                            groups_per_program=4, tau_clamp=24.0,
                            iblk=0):
    """Fused window + POOLED far-list accelerations (production path).

    Like :func:`pallas_window_eval` but the far lists arrive as the
    compacted tile pool (``bh_window.build_pool``): the kernel streams
    each group's ceil(far_n/tile) tiles from HBM with double-buffered
    manual DMA instead of fetching a dense fixed-cap block.  Monopole
    only.
    """
    gsz = group_size
    wg = window_groups
    npad = s_pos.shape[1]
    ng = npad // gsz
    ct, rows, tile = pool.shape
    assert rows == 16
    gpp = max(1, groups_per_program)
    ng2 = ((ng + gpp - 1) // gpp) * gpp
    gpad = ng2 - ng
    soft_sq = float(softening) ** 2

    tau = jnp.asarray(steps_since, jnp.float32) * jnp.asarray(
        dt, jnp.float32)
    tc = jnp.minimum(tau, jnp.float32(tau_clamp) * jnp.asarray(
        dt, jnp.float32))
    adv = jnp.stack([tau, tc * tau - 0.5 * tc * tc]).reshape(1, 2)

    pos8 = jnp.concatenate(
        [s_pos, s_mass[None, :], jnp.zeros((4, npad), jnp.float32)],
        axis=0)
    pos8_winpad = jax.lax.dynamic_slice_in_dim(
        jnp.pad(pos8, ((0, 0), (wg * gsz, (wg + gpad) * gsz))),
        0, (ng2 + 2 * wg) * gsz, axis=1)
    if gpad:
        pstart = jnp.pad(pstart, (0, gpad))
        far_n = jnp.pad(far_n, (0, gpad))

    n_views = gpp + 2 * wg
    in_specs = [pl.BlockSpec(
        (8, gsz), (lambda g, *_, k=k: (0, g * gpp + k)),
        memory_space=pltpu.VMEM) for k in range(n_views)]
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    in_specs.append(pl.BlockSpec((1, 2), lambda g, *_: (0, 0),
                                 memory_space=pltpu.SMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ng2 // gpp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, gpp * gsz), lambda g, *_: (0, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, n_views * gsz), jnp.float32),
            pltpu.VMEM((2, rows, tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(pstart_ref, far_n_ref, *args):
        adv_ref = args[n_views + 1]
        rest = args[:n_views + 1] + args[n_views + 2:]
        _eval_kernel_pool(
            adv_ref, pstart_ref, far_n_ref, *rest,
            soft_sq=soft_sq, G=float(G), gsz=gsz, tile=tile,
            n_views=n_views, gpp=gpp, wg=wg, iblk=iblk)

    interpret = jax.default_backend() != "tpu"
    n_window = 2 * wg + 1
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, ng2 * gsz), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(ng) * gsz * (n_window * gsz + 2048) * 17,
            bytes_accessed=ng * gsz * 8 * 4 + ct * rows * tile * 4,
            transcendentals=int(ng) * gsz * (n_window * gsz + 2048)),
        interpret=interpret,
    )(pstart, far_n, *([pos8_winpad] * n_views), pool, adv)

    return out[:3, :ng * gsz]


@functools.partial(
    jax.jit,
    static_argnames=("G", "softening", "group_size", "window_groups",
                     "far_tile", "local_slice",
                     "groups_per_program", "haloed", "use_mxu",
                     "use_cols", "tau_clamp", "iblk", "dbg", "vmem_mb",
                     "no_cost", "tgt_mode"))
def pallas_window_eval(s_pos, s_mass, far, far_n,
                       near=None, steps_since=0, dt=0.0, *,
                       G, softening, group_size=512, window_groups=3,
                       far_tile=512, local_slice=None,
                       groups_per_program=4, haloed=False,
                       use_mxu=False, use_cols=False, tau_clamp=24.0,
                       iblk=0, dbg="", vmem_mb=0, no_cost=False,
                       tgt_mode="mxu"):
    """Fused near-window + far-list accelerations.

    Args:
      s_pos: ``(3, npad)`` f32 sorted positions (npad multiple of group).
      s_mass: ``(npad,)`` f32 sorted masses (padding slots zero).
      far: ``(ng, R, L)`` f32 STORED far entries (bh_window.far_layout
        rows); the kernel advances each tile to the current
        τ = steps_since·dt in-register (6 VPU ops/entry) instead of
        pre-materializing an advanced tensor (round 2's
        far_eval_tensor burned ~1.3 GB of HBM round-trip per step at
        1M).  R 13/16 selects the quadrupole pair math.
      far_n: ``(ng,)`` int32 actual entry counts.
      steps_since, dt: advance inputs (traced scalars).
      tau_clamp: static curvature horizon (steps) for the quadratic term.
      use_mxu: static — route monopole pair math through the MXU
        |a|²+|b|²−2ab form.  MEASURED SLOWER on v5e (77.5 vs 48.6 ms at
        1M: K=3 / 3-wide matmuls waste full MXU passes per 128×128
        output tile, and precision=HIGHEST triples them); kept for A/B.
      local_slice: optional static ``(group_offset, n_groups)`` — evaluate
        only that contiguous group range (the multi-chip path hands each
        device its group shard; ``s_pos``/``s_mass`` stay global so the
        Morton windows cross shard boundaries correctly).
      groups_per_program: groups evaluated by one Pallas program (the
        group axis is zero-padded to a multiple).
      haloed: static — ``s_pos``/``s_mass`` already carry ``window_groups``
        halo groups on EACH side of the evaluated range (the sharded
        step's ppermute halo exchange); ``far4``/``far_n`` cover only the
        interior groups and the output is the interior shard.  Mutually
        exclusive with ``local_slice``.
    Returns:
      ``(3, n_groups * group_size)`` f32 accelerations in sorted order
      (the full ``npad`` when ``local_slice`` is None).
    """
    gsz = group_size
    wg = window_groups
    npad = s_pos.shape[1]
    if haloed:
        assert local_slice is None
        offset, ng = 0, npad // gsz - 2 * wg
    else:
        offset, ng = local_slice or (0, npad // gsz)
    R = far.shape[1]
    L = far.shape[2]
    soft_sq = float(softening) ** 2
    gpp = max(1, groups_per_program)
    # VMEM guard: the dense (gpp, R, L) far block is double-buffered by
    # the pipeline, and at EXTREME list caps (L 8-16K, quadrupole R 13/16)
    # it alone can exceed the ~16 MB scoped-VMEM budget (measured at the
    # calibrated 10M shape: "Scoped allocation 16.82M > 16.00M",
    # docs/measurements_r4/decide20_10m.log).  Halve gpp until the
    # estimated footprint fits; correctness is gpp-invariant.
    def _vmem_est(g):
        nv = g + 2 * wg
        blocks = (g * R * L            # far block
                  + nv * 8 * gsz       # window views
                  + 8 * g * gsz        # output
                  + gsz * _tgt_width(g))  # pre-transposed targets (upper bd)
        scratch = 8 * max(gsz, min(far_tile, L), nv * gsz)
        return (2 * blocks + scratch) * 4
    while gpp > 1 and _vmem_est(gpp) > 14 * 1024 * 1024:
        gpp //= 2
    ng2 = ((ng + gpp - 1) // gpp) * gpp
    gpad = ng2 - ng

    # In-kernel advance scalars: τ and the clamped quadratic coefficient
    # coef₂ = t_c·τ − t_c²/2.  Passed as a (1, 2) SMEM tensor input (the
    # guide's scalar-parameter pattern) — scalar PREFETCH is for int32
    # index data.
    tau = jnp.asarray(steps_since, jnp.float32) * jnp.asarray(
        dt, jnp.float32)
    tc = jnp.minimum(tau, jnp.float32(tau_clamp) * jnp.asarray(
        dt, jnp.float32))
    adv = jnp.stack([tau, tc * tau - 0.5 * tc * tc]).reshape(1, 2)

    pos8 = jnp.concatenate(
        [s_pos, s_mass[None, :], jnp.zeros((4, npad), jnp.float32)], axis=0)
    # Window source array padded by wg zero-mass groups on each side (plus
    # the group-axis padding), then sliced to the local range + halos.
    # Targets are NOT passed separately: group j of a program is window
    # view j+wg — a bodies-major (npad, 8) input would pad 8 -> 128 lanes
    # (16x HBM, OOM at 10M bodies).
    K = 0 if near is None else near.shape[1]
    if K:
        # Spatial neighbour groups read as whole (8, gsz) BLOCKS chosen
        # by a scalar-prefetch table (block DMA, no gathers).  Global ids
        # only make sense against the full sorted array.
        assert not haloed and local_slice is None, \
            "near groups require the full-state eval path"

    if haloed:
        # Input already carries its halos; only the group-axis padding.
        pos8_winpad = (jnp.pad(pos8, ((0, 0), (0, gpad * gsz)))
                       if gpad else pos8)
    else:
        pos8_winpad = jax.lax.dynamic_slice_in_dim(
            jnp.pad(pos8, ((0, 0), (wg * gsz, (wg + gpad) * gsz))),
            offset * gsz, (ng2 + 2 * wg) * gsz, axis=1)
    if K:
        # One appended zero-mass group = the "no neighbour" block.
        pos8_winpad = jnp.pad(pos8_winpad, ((0, 0), (0, gsz)))
        zero_block = ng2 + 2 * wg
        nb = jnp.where((near >= 0) & (near < ng), near + wg,
                       zero_block).astype(jnp.int32)
        if gpad:
            nb = jnp.pad(nb, ((0, gpad), (0, 0)),
                         constant_values=zero_block)
        # SMEM layout: the large axis must be minor — an (ng2, K) table
        # pads K -> 128 lanes and blows the 1 MB SMEM budget at 1M
        # bodies (measured: 2 MB for (3908, 8) int32).
        nb = nb.T                                     # (K, ng2)
    if gpad:
        far = jnp.pad(far, ((0, gpad), (0, 0), (0, 0)))
        far_n = jnp.pad(far_n, (0, gpad))

    n_views = gpp + 2 * wg
    n_prefetch = 2 if K else 1
    # Kernel selection decides the target path: the default row kernel
    # transposes targets IN-KERNEL on the MXU (identity-matmul trick —
    # Mosaic's plain transposes and XLA's pre-transpose both cost
    # ~25-30 ms/eval at 1M, measured decide5-9); the A/B variants and
    # tgt_mode="pre" consume a pre-transposed per-program-aligned input
    # instead.
    if use_mxu and R in (8, 10):
        body = _eval_kernel_mxu
    elif use_cols and R not in (13, 16):
        body = _eval_kernel_cols
    else:
        body = _eval_kernel
    tgt_eff = tgt_mode if body is _eval_kernel else "pre"

    nprog = ng2 // gpp
    tgt_in = ()
    if tgt_eff == "pre":
        # Pre-transposed targets, PER-PROGRAM ALIGNED: (gsz,
        # nprog*width) with program p's group j x/y/z at lanes
        # p*width + 16*j .. +3.
        width = _tgt_width(gpp)
        tgtT = jax.lax.dynamic_slice_in_dim(
            pos8_winpad[0:3], wg * gsz, ng2 * gsz, axis=1)
        tgtT = tgtT.reshape(3, nprog, gpp, gsz).transpose(3, 1, 2, 0)
        tgtT = jnp.pad(tgtT,
                       ((0, 0), (0, 0), (0, 0), (0, TGT_LANES - 3)))
        tgtT = tgtT.reshape(gsz, nprog, gpp * TGT_LANES)
        if width != gpp * TGT_LANES:
            tgtT = jnp.pad(
                tgtT, ((0, 0), (0, 0), (0, width - gpp * TGT_LANES)))
        tgt_in = (tgtT.reshape(gsz, nprog * width),)
    # Index maps receive (grid index, scalar-prefetch refs).
    in_specs = []
    for k in range(n_views):
        in_specs.append(pl.BlockSpec(
            (8, gsz), (lambda g, *_, k=k: (0, g * gpp + k)),
            memory_space=pltpu.VMEM))
    if tgt_eff == "pre":
        in_specs.append(pl.BlockSpec(
            (gsz, _tgt_width(gpp)), (lambda g, *_: (0, g)),
            memory_space=pltpu.VMEM))
    if K:
        # gpp*K neighbour views; block column chosen by the prefetched
        # table (first scalar-prefetch argument).
        for j in range(gpp):
            for k in range(K):
                in_specs.append(pl.BlockSpec(
                    (8, gsz),
                    (lambda g, nb_ref, *_, j=j, k=k:
                     (0, nb_ref[k, g * gpp + j])),
                    memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((gpp, R, L), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, 2), lambda g, *_: (0, 0),
                                 memory_space=pltpu.SMEM))

    # The cols kernel stages transposed source blocks through a VMEM
    # scratch (Mosaic cannot dynamic-slice values, only refs); the row
    # kernel stages the window views into one contiguous span for its
    # far-structured window loop.
    if body is _eval_kernel_cols:
        scratch = [pltpu.VMEM((max(gsz, min(far_tile, L)), 8),
                              jnp.float32)]
    elif body is _eval_kernel:
        scratch = [pltpu.VMEM((8, n_views * gsz), jnp.float32)]
    else:
        scratch = []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(ng2 // gpp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, gpp * gsz), lambda g, *_: (0, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    def kernel(*args):
        far_n_ref = args[n_prefetch - 1]
        if scratch:
            rest = args[n_prefetch:-3] + args[-2:]   # inputs, out, colr
            adv_ref = args[-3]
        else:
            rest = args[n_prefetch:-2] + (args[-1],)
            adv_ref = args[-2]
        extra = ({"iblk": iblk, "dbg": dbg, "tgt_mode": tgt_eff}
                 if body is _eval_kernel else {})
        body(adv_ref, far_n_ref, *rest,
             soft_sq=soft_sq, G=float(G), gsz=gsz,
             far_tile=far_tile, n_views=n_views, gpp=gpp, wg=wg,
             n_near=K, **extra)

    interpret = jax.default_backend() != "tpu"
    flops_far = 40 if R in (13, 16) else 20
    n_window = 2 * wg + 1
    prefetch_args = (nb, far_n) if K else (far_n,)
    extra_kw = {}
    if not no_cost:
        extra_kw["cost_estimate"] = pl.CostEstimate(
            flops=int(ng) * gsz * ((n_window + K) * gsz * 17
                                   + L * flops_far),
            bytes_accessed=ng * gsz * 8 * 4 + ng * R * L * 4,
            transcendentals=int(ng) * gsz * ((n_window + K) * gsz + L))
    if vmem_mb:
        extra_kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
            dimension_semantics=("arbitrary",))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, ng2 * gsz), jnp.float32),
        interpret=interpret,
        **extra_kw,
    )(*prefetch_args,
      *([pos8_winpad] * n_views), *tgt_in,
      *([pos8_winpad] * (gpp * K)), far, adv)

    return out[:3, :ng * gsz]
