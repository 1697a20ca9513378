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
  (bh_window.far_eval_tensor): a ≈ m·d/r³ − (Q·d)/r⁵ + (5/2)(dᵀQd)d/r⁷.

The pure-XLA path remains in bh_window.py as the fallback/oracle; the two
are asserted equal in tests/test_bh_window.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _eval_kernel_mxu(far_n_ref, shared_n_ref, *rest, soft_sq, G, gsz,
                     far_tile, n_views, gpp, wg, supergroup):
    """MXU variant of :func:`_eval_kernel` (monopole lists only)."""
    window_refs = rest[:n_views]
    far_ref = rest[n_views]
    shared_ref = rest[n_views + 1]
    out_ref = rest[n_views + 2]

    p = pl.program_id(0)
    n_window = 2 * wg + 1

    for j in range(gpp):
        g = p * gpp + j
        base = j * gsz
        tgt8 = window_refs[j + wg][:]                  # (8, gsz)
        center = jnp.mean(tgt8[0:3, :], axis=1, keepdims=True)  # (3, 1)
        iblk = min(gsz, 512)
        for i0 in range(0, gsz, iblk):
            tgt_c = (tgt8[0:3, i0:i0 + iblk] - center).T        # (iblk, 3)
            ti_sq = jnp.sum(tgt_c * tgt_c, axis=1, keepdims=True)
            wp = jnp.zeros((iblk, 3), jnp.float32)
            ws = jnp.zeros((iblk, 1), jnp.float32)

            for k in range(n_window):
                wref = window_refs[j + k]
                wp, ws = _mxu_accum(tgt_c, ti_sq, wref[0:3, :] - center,
                                    wref[3:4, :], wp, ws, soft_sq)

            def list_loop(ref, row, count, carry):
                tile = min(far_tile, ref.shape[2])
                n_tiles = (count + tile - 1) // tile

                def tile_body(t, carry):
                    wp, ws = carry
                    off = pl.multiple_of(t * tile, tile)
                    src_c = ref[row, 0:3, pl.ds(off, tile)] - center
                    fm = ref[row, 3:4, pl.ds(off, tile)]
                    return _mxu_accum(tgt_c, ti_sq, src_c, fm, wp, ws,
                                      soft_sq)

                return jax.lax.fori_loop(0, n_tiles, tile_body, carry)

            wp, ws = list_loop(far_ref, j, far_n_ref[g], (wp, ws))
            sg = jnp.minimum(g // supergroup, shared_n_ref.shape[0] - 1)
            wp, ws = list_loop(shared_ref, 0, shared_n_ref[sg], (wp, ws))

            acc3 = (wp - tgt_c * ws) * G                        # (iblk, 3)
            out_ref[0:3, base + i0:base + i0 + iblk] = acc3.T


def _eval_kernel(far_n_ref, shared_n_ref, *rest, soft_sq, G, gsz,
                 far_tile, n_views, gpp, wg, supergroup):
    window_refs = rest[:n_views]
    far_ref = rest[n_views]
    shared_ref = rest[n_views + 1]
    out_ref = rest[n_views + 2]

    p = pl.program_id(0)
    n_window = 2 * wg + 1

    for j in range(gpp):
        g = p * gpp + j
        base = j * gsz
        # Group j's own bodies are window view j+wg (no separate
        # bodies-major input: an (npad, 8) layout pads 8 -> 128 lanes on
        # TPU — a 16x HBM blowup that OOMs at 10M bodies).  One (8, gsz)
        # -> (gsz, 8) transpose per group puts targets on sublanes.
        tgt = window_refs[j + wg][:].T                 # (gsz, 8)
        # Sub-tile the i (target body) dimension so the (i, source)
        # pairwise intermediates stay within VMEM for large group sizes
        # (the (iblk, W) temporaries are the kernel's VMEM high-water
        # mark; at gsz 1024 an iblk of 512 overflows the Mosaic budget).
        iblk = min(gsz, 512 if gsz <= 512 else 256)
        for i0 in range(0, gsz, iblk):
            xi = tgt[i0:i0 + iblk, 0:1]
            yi = tgt[i0:i0 + iblk, 1:2]
            zi = tgt[i0:i0 + iblk, 2:3]

            ax = jnp.zeros((iblk, 1), jnp.float32)
            ay = jnp.zeros((iblk, 1), jnp.float32)
            az = jnp.zeros((iblk, 1), jnp.float32)

            # Near field: group j's Morton window = views j..j+2wg.
            for k in range(n_window):
                wref = window_refs[j + k]
                dax, day, daz = _pair_accum(
                    xi, yi, zi, wref[0:1, :], wref[1:2, :], wref[2:3, :],
                    wref[3:4, :], soft_sq)
                ax += dax
                ay += day
                az += daz

            def list_loop(ref, row, count, carry):
                # Frozen-entry tiles, bounded by the actual entry count.
                tile = min(far_tile, ref.shape[2])
                n_tiles = (count + tile - 1) // tile
                quad = ref.shape[1] > 4

                def tile_body(t, carry):
                    ax, ay, az = carry
                    off = pl.multiple_of(t * tile, tile)
                    fx = ref[row, 0:1, pl.ds(off, tile)]
                    fy = ref[row, 1:2, pl.ds(off, tile)]
                    fz = ref[row, 2:3, pl.ds(off, tile)]
                    fm = ref[row, 3:4, pl.ds(off, tile)]
                    if quad:
                        q6 = tuple(ref[row, 4 + k:5 + k, pl.ds(off, tile)]
                                   for k in range(6))
                        dax, day, daz = _pair_accum_quad(
                            xi, yi, zi, fx, fy, fz, fm, q6, soft_sq)
                    else:
                        dax, day, daz = _pair_accum(
                            xi, yi, zi, fx, fy, fz, fm, soft_sq)
                    return ax + dax, ay + day, az + daz

                return jax.lax.fori_loop(0, n_tiles, tile_body, carry)

            ax, ay, az = list_loop(far_ref, j, far_n_ref[g], (ax, ay, az))
            # Clamp the supergroup index: zero-padded tail groups (g >= ng)
            # would otherwise read one slot past the (nsg,) count array.
            sg = jnp.minimum(g // supergroup, shared_n_ref.shape[0] - 1)
            ax, ay, az = list_loop(shared_ref, 0, shared_n_ref[sg],
                                   (ax, ay, az))

            acc3 = jnp.concatenate([ax * G, ay * G, az * G], axis=1)
            out_ref[0:3, base + i0:base + i0 + iblk] = acc3.T  # (3, iblk)


@functools.partial(
    jax.jit,
    static_argnames=("G", "softening", "group_size", "window_groups",
                     "far_tile", "supergroup", "local_slice",
                     "groups_per_program", "haloed"))
def pallas_window_eval(s_pos, s_mass, far4, far_n, shared4, shared_n, *,
                       G, softening, group_size=512, window_groups=3,
                       far_tile=512, supergroup=1, local_slice=None,
                       groups_per_program=4, haloed=False):
    """Fused near-window + far-list (+ supergroup-shared) accelerations.

    Args:
      s_pos: ``(3, npad)`` f32 sorted positions (npad multiple of group).
      s_mass: ``(npad,)`` f32 sorted masses (padding slots zero).
      far4: ``(ng, 4, L)`` f32 frozen far entries [x, y, z, mass] with the
        COM already advanced to the current step — or ``(ng, 16, L)`` with
        traceless quadrupole rows 4:10 appended (see
        bh_window.far_eval_tensor); the row count selects the pair math.
      far_n: ``(ng,)`` int32 actual entry counts.
      shared4: ``(nsg, 4|16, Ls)`` f32 supergroup-shared entries.
      shared_n: ``(nsg,)`` int32.
      supergroup: groups per supergroup (g -> shared row g // supergroup).
      local_slice: optional static ``(group_offset, n_groups)`` — evaluate
        only that contiguous group range (the multi-chip path hands each
        device its group shard; ``s_pos``/``s_mass`` stay global so the
        Morton windows cross shard boundaries correctly).
      groups_per_program: groups evaluated by one Pallas program (clamped
        to the supergroup size so the shared row stays constant within a
        program; the group axis is zero-padded to a multiple).
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
    R = far4.shape[1]
    L = far4.shape[2]
    Rs = shared4.shape[1]
    Ls = shared4.shape[2]
    soft_sq = float(softening) ** 2
    S = supergroup
    gpp = max(1, min(groups_per_program, S))
    # gpp must DIVIDE the supergroup size: the shared BlockSpec fetches one
    # row per program at (g*gpp)//S, so a program whose groups straddle two
    # supergroups would read the wrong shared entries.  Shrink to the
    # largest divisor (S is small; this loop is compile-time).
    while S % gpp:
        gpp -= 1
    ng2 = ((ng + gpp - 1) // gpp) * gpp
    gpad = ng2 - ng
    nsg = shared4.shape[0]

    pos8 = jnp.concatenate(
        [s_pos, s_mass[None, :], jnp.zeros((4, npad), jnp.float32)], axis=0)
    # Window source array padded by wg zero-mass groups on each side (plus
    # the group-axis padding), then sliced to the local range + halos.
    # Targets are NOT passed separately: group j of a program is window
    # view j+wg — a bodies-major (npad, 8) input would pad 8 -> 128 lanes
    # (16x HBM, OOM at 10M bodies).
    if haloed:
        # Input already carries its halos; only the group-axis padding.
        pos8_winpad = (jnp.pad(pos8, ((0, 0), (0, gpad * gsz)))
                       if gpad else pos8)
    else:
        pos8_winpad = jax.lax.dynamic_slice_in_dim(
            jnp.pad(pos8, ((0, 0), (wg * gsz, (wg + gpad) * gsz))),
            offset * gsz, (ng2 + 2 * wg) * gsz, axis=1)
    if gpad:
        far4 = jnp.pad(far4, ((0, gpad), (0, 0), (0, 0)))
        far_n = jnp.pad(far_n, (0, gpad))

    n_views = gpp + 2 * wg
    # Index maps receive (grid index, scalar-prefetch refs) — ignored.
    in_specs = []
    for k in range(n_views):
        in_specs.append(pl.BlockSpec(
            (8, gsz), (lambda g, *_, k=k: (0, g * gpp + k)),
            memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((gpp, R, L), lambda g, *_: (g, 0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(
        (1, Rs, Ls), lambda g, *_: (jnp.minimum((g * gpp) // S, nsg - 1),
                                    0, 0),
        memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ng2 // gpp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, gpp * gsz), lambda g, *_: (0, g),
                               memory_space=pltpu.VMEM),
    )

    # MXU form for pure-monopole lists (the production configuration);
    # quadrupole (R == 16) keeps the direct-difference VPU kernel (its
    # Q·d math has no matmul shape).
    body = _eval_kernel if R > 4 else _eval_kernel_mxu

    def kernel(far_n_ref, shared_n_ref, *rest):
        body(far_n_ref, shared_n_ref, *rest,
             soft_sq=soft_sq, G=float(G), gsz=gsz,
             far_tile=far_tile, n_views=n_views, gpp=gpp, wg=wg,
             supergroup=S)

    interpret = jax.default_backend() != "tpu"
    flops_far = 40 if R > 4 else 17
    n_window = 2 * wg + 1
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, ng2 * gsz), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(ng) * gsz * (n_window * gsz * 17
                                   + (L + Ls) * flops_far),
            bytes_accessed=ng * gsz * 8 * 4 + ng * R * L * 4,
            transcendentals=int(ng) * gsz * (n_window * gsz + L + Ls)),
        interpret=interpret,
    )(far_n, shared_n, *([pos8_winpad] * n_views), far4, shared4)

    return out[:3, :ng * gsz]
