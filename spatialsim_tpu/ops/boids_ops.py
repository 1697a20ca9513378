"""Boids flocking kernels — uniform grid hash + fixed-capacity neighbour gather.

TPU-native re-design of the reference's Numba kernels
(``boids/flock.py:16-308``):

* The reference builds CSR cell lists (``assign_cells`` → host ``argsort`` →
  ``build_cell_lists``) and then, per boid, walks every member of the 27
  neighbouring cells with data-dependent loops.
* Here the grid is a **sort + searchsorted** program: boids are sorted by
  cell id, each cell's occupants are a contiguous run located with two
  binary searches, and each boid gathers a *fixed* ``cell_capacity`` window
  from each neighbour cell.  All shapes are static, so the whole flocking
  step jits into one XLA program.  Results are exact whenever no cell holds
  more than ``cell_capacity`` boids (the parity tests run in that regime).

Semantics preserved from the reference:
  * neighbour predicate ``0.0001 < dist_sq < perception_sq``
    (``flock.py:150``; the ``> 0.0001`` guard also removes self-pairs),
  * separation weighting ``(d / |d|) / |d|`` inside ``separation_radius``,
  * steering = ``normalize(acc) * max_speed - vel`` clamped to ``max_force``
    then scaled by the behaviour weight (``flock.py:174-238``),
  * per-axis soft wall springs inside ``wall_margin`` with strength
    ``min(2*penetration/margin, 1) * wall_force`` (``flock.py:260-281``),
  * speed clamp then drift, colour blended toward the neighbourhood mean
    including self (``flock.py:283-308``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _window_accumulate(s_pos, s_vel, s_col, s_grpf, *, gsz, wg,
                       perception_sq, separation_sq, prev_wg=None,
                       use_pallas=None, halo9=None, halo_grpf=None):
    """Dense Morton-window accumulation over SORTED padded inputs.

    ``s_pos``/``s_vel``/``s_col``: ``(3, npad)`` in this pass's sorted
    layout (padding slots at 1e9).  ``s_grpf``: previous pass's group ids
    per slot as ``(1, npad)`` f32 (or None) — pairs already inside the
    previous pass's window are excluded exactly.  Returns raw neighbour
    accumulators in SORTED layout: ``(sep (ng,3,gsz), sep_count, align,
    coh, csum, nb_count)``.

    ``halo9``: optional ``(left, right)`` pair of ``(9, wg*gsz)`` arrays
    — rows ``[vel3, pos3, col3]`` — holding the sorted slots just
    OUTSIDE this array (the sharded engine's ppermute halos,
    :func:`spatialsim_tpu.parallel.sharded.make_sharded_boids_step`).
    Without it the window is edge-padded with far-away constants, the
    single-chip semantic.  ``halo_grpf``: the matching ``(1, wg*gsz)``
    pair for ``s_grpf``.  XLA path only.

    ``use_pallas`` None = auto.  Auto currently means this XLA form
    everywhere: measured chained-marginal on the v5e (scripts/
    decide12.py, round 3), XLA fuses this accumulation well (15.2 ms at
    500K) and beats the Pallas kernel (26.3 ms) — the opposite of the
    n-body eval.  The kernel remains selectable and is asserted equal
    in tests/test_boids_window.py.
    """
    npad = s_pos.shape[1]
    ng = npad // gsz
    if use_pallas is None:
        use_pallas = False
    if halo9 is not None:
        assert not use_pallas, "halos are XLA-path only"
    if use_pallas:
        from spatialsim_tpu.ops.boids_window_kernel import (
            boids_window_pallas)
        grp_row = (s_grpf if s_grpf is not None
                   else jnp.zeros((1, npad), jnp.float32))
        state16 = jnp.concatenate(
            [s_pos, grp_row, s_vel, s_col,
             jnp.zeros((6, npad), jnp.float32)], axis=0)
        rows = boids_window_pallas(
            state16, gsz=gsz, wg=wg,
            perception_sq=float(perception_sq),
            separation_sq=float(separation_sq),
            prev_wg=(float(prev_wg if prev_wg is not None else wg)
                     if s_grpf is not None else None))

        def sh(r3):
            return jnp.moveaxis(r3.reshape(3, ng, gsz), 1, 0)
        return (sh(rows[0:3]),
                rows[12].reshape(ng, gsz).astype(jnp.int32),
                sh(rows[3:6]), sh(rows[6:9]), sh(rows[9:12]),
                rows[13].reshape(ng, gsz).astype(jnp.int32))
    # k-SHIFT accumulation: for each window offset k in [-wg, wg], pair
    # every (ng, gsz) target block against the k-shifted block VIEW of
    # the flat padded array.  The round-2/3 form pre-materialized
    # (ng, 3, W) window stacks via pad + 2wg+1 dynamic slices + stack +
    # 4-D transpose — measured round 4 (scripts/decide16.py) that
    # window construction cost MORE than the pair math itself (~18 ms
    # of pass-1's 32.9 ms at 500K vs ~15 ms of accumulate).  Shifted
    # flat slices are contiguous, need no transposes, and fuse into the
    # same pair loops.
    # MXU form (round 4): the per-shift neighbour sums are batched
    # matmuls — mask (ng, gsz, gsz) @ values (ng, gsz, 9) — instead of
    # 14 separate VPU broadcast-reduces.  decide16_v2 measured the
    # reduce form at 33 ms (pass 1) / 77 ms (both passes) at 500K; the
    # matmul form reads each mask once and rides the systolic array.
    # Separation decomposes exactly: sum_j w_ij (p_i - p_j)
    #   = p_i * rowsum(w) - w @ p_j.
    # HIGHEST precision keeps the contraction f32-exact (tests compare
    # against the sequential oracle at 1e-4).
    pw = wg * gsz
    if halo9 is not None:
        hl, hr = halo9
        S9 = jnp.concatenate(
            [hl, jnp.concatenate([s_vel, s_pos, s_col], axis=0), hr],
            axis=1)
    else:
        P = jnp.pad(s_pos, ((0, 0), (pw, pw)), constant_values=2e9)
        # Value stack rows: [vel(3); pos(3); col(3)] — one slice per shift.
        S9 = jnp.concatenate(
            [jnp.pad(s_vel, ((0, 0), (pw, pw))), P,
             jnp.pad(s_col, ((0, 0), (pw, pw)))], axis=0)
    gpos = s_pos.reshape(3, ng, gsz)
    if s_grpf is not None:
        if halo_grpf is not None:
            G = jnp.concatenate(
                [halo_grpf[0], s_grpf, halo_grpf[1]], axis=1)
        else:
            G = jnp.pad(s_grpf, ((0, 0), (pw, pw)), constant_values=1e9)
        ggrp = s_grpf.reshape(ng, gsz)
    # Dedup threshold: how wide the PREVIOUS pass's window was (its own
    # wg), not this pass's.
    wg_f = jnp.float32(prev_wg if prev_wg is not None else wg)
    hi = jax.lax.Precision.HIGHEST

    acc9 = jnp.zeros((9, ng, gsz), jnp.float32)   # [align; coh; csum]
    sepj = jnp.zeros((3, ng, gsz), jnp.float32)   # sum_j w_ij p_j
    sep_row = jnp.zeros((ng, gsz), jnp.float32)   # rowsum(w)
    sep_count = jnp.zeros((ng, gsz), jnp.int32)
    nb_count = jnp.zeros((ng, gsz), jnp.int32)

    for k in range(2 * wg + 1):
        off = k * gsz
        w9 = jax.lax.dynamic_slice_in_dim(S9, off, npad, 1).reshape(
            9, ng, gsz)
        wp = w9[3:6]
        d = gpos[:, :, :, None] - wp[:, :, None, :]  # (3, ng, gsz, gsz)
        dist_sq = jnp.sum(d * d, axis=0)
        is_nb = (dist_sq < perception_sq) & (dist_sq > 0.0001)
        if s_grpf is not None:
            # Drop pairs the previous pass already captured (exact
            # dedup: group ids are small ints, exact in f32).
            wgp = jax.lax.dynamic_slice_in_dim(G, off, npad, 1).reshape(
                ng, gsz)
            seen = jnp.abs(ggrp[:, :, None] - wgp[:, None, :]) <= wg_f
            is_nb = is_nb & ~seen
        is_sep = is_nb & (dist_sq < separation_sq)

        inv_dist = jax.lax.rsqrt(jnp.maximum(dist_sq, 1e-12))
        wsep = jnp.where(is_sep, inv_dist * inv_dist, 0.0)
        nbf = is_nb.astype(jnp.float32)
        acc9 = acc9 + jnp.einsum('gij,cgj->cgi', nbf, w9, precision=hi)
        # Per-group-centred positions: sum_j w (p_j - c_g) keeps the
        # matmul operands at window-extent magnitude, so the final
        # p_i*rowsum - sepj subtraction doesn't cancel catastrophically
        # at domain-scale |p| (bounds=500).
        sepj = sepj + jnp.einsum('gij,cgj->cgi', wsep,
                                 wp - gpos[:, :, :1], precision=hi)
        sep_row = sep_row + jnp.sum(wsep, axis=2)
        sep_count = sep_count + jnp.sum(is_sep, axis=2)
        nb_count = nb_count + jnp.sum(is_nb, axis=2)

    sep = (gpos - gpos[:, :, :1]) * sep_row[None] - sepj
    align, coh, csum = acc9[0:3], acc9[3:6], acc9[6:9]
    # Keep the historical (ng, 3, gsz) return contract.
    mv = lambda a: jnp.moveaxis(a, 0, 1)  # noqa: E731
    return (mv(sep), sep_count, mv(align), mv(coh), mv(csum), nb_count)


def _window_pass(pos, vel, col, grp_prev, code, *, n, gsz, wg,
                 perception_sq, separation_sq, prev_wg=None):
    """One Morton-window pass over ORIGINAL-order inputs (stateless API).

    Sorts by ``code``, runs :func:`_window_accumulate`, and unsorts the
    raw accumulators back to original boid order; also returns this
    pass's group id per boid (for the second pass's exact dedup).  The
    production stepper instead keeps its state sorted and frozen-order
    between periodic re-sorts (models/boids.py) — this wrapper remains
    the oracle the capture-rate tests measure.
    """
    order = jnp.argsort(code).astype(jnp.int32)
    npad = ((n + gsz - 1) // gsz) * gsz
    pad = npad - n
    order_pad = jnp.concatenate(
        [order, jnp.broadcast_to(order[-1], (pad,))])
    # One packed gather for all 9 state rows (per-index gather cost —
    # scripts/gather_bench.py).
    S = jnp.concatenate([pos, vel, col], axis=0)[:, order_pad]
    s_pos, s_vel, s_col = S[0:3], S[3:6], S[6:9]
    # Padding slots: collapse onto a far-away point so they never count
    # as neighbours of real boids.
    pad_mask = (jnp.arange(npad) >= n)[None, :]
    s_pos = jnp.where(pad_mask, 1e9, s_pos)

    grp = jnp.zeros((n,), jnp.int32).at[order].set(
        (jnp.arange(n, dtype=jnp.int32) // gsz))
    if grp_prev is not None:
        s_grpf = grp_prev[order_pad].astype(jnp.float32)
        s_grpf = jnp.where(pad_mask[0], -1e9, s_grpf)[None, :]  # (1, npad)
    else:
        s_grpf = None

    outs = _window_accumulate(s_pos, s_vel, s_col, s_grpf, gsz=gsz, wg=wg,
                              perception_sq=perception_sq,
                              separation_sq=separation_sq, prev_wg=prev_wg)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))

    # Unsort all 14 accumulator rows in one packed gather.
    sep, sep_count, align, coh, csum, nb_count = outs
    rows = jnp.concatenate(
        [jnp.moveaxis(a, 0, 1).reshape(3, npad)
         for a in (sep, align, coh, csum)]
        + [sep_count.reshape(1, npad).astype(jnp.float32),
           nb_count.reshape(1, npad).astype(jnp.float32)], axis=0)
    A = rows[:, inv]                                   # (14, n)
    return (A[0:3], A[12].astype(jnp.int32), A[3:6], A[6:9], A[9:12],
            A[13].astype(jnp.int32), grp)


def flocking_forces_window(pos, vel, col, *, cell_size, grid_dim, offset,
                           perception_radius, separation_radius,
                           separation_weight, alignment_weight,
                           cohesion_weight, max_speed, max_force,
                           group_size=256, window_groups=2,
                           pass2_window_groups=0,
                           second_pass=True, return_counts=False):
    """Production flocking path: Morton-sorted sliding-window neighbours.

    The grid-hash path (:func:`flocking_forces`) is exact but pays the
    TPU gather tax (27 searchsorted + fixed-capacity gathers per boid —
    measured ~1 s/step at 100K boids).  Here boids are sorted by the
    Morton code of their grid cell and each group of ``group_size``
    interacts densely with the ``2*window_groups+1`` neighbouring groups
    (pure shifted slices).

    A single Morton pass misses spatial neighbours that straddle coarse
    octant boundaries (~5-10% of pairs).  ``second_pass`` (default on)
    runs a second window pass over a DIAGONALLY SHIFTED Morton code —
    shift 3/7 of the grid per axis, chosen so every power-of-two plane
    moves by >= 1/7 of its spacing, putting pass-one's boundary pairs in
    pass-two's interior.  Pairs already captured by pass one are excluded
    exactly (group-distance test), the raw neighbour accumulators merge,
    and steering applies once — so every captured pair follows the exact
    reference force law (``flock.py:174-238``) with no double counting.
    Measured capture rate >= 99.5% (tests/test_boids_window.py).
    """
    from spatialsim_tpu.ops.morton import _spread3

    n = pos.shape[1]
    c = cell_coords(pos, cell_size, grid_dim, offset)
    code = (_spread3(c[0]) | (_spread3(c[1]) << 1) | (_spread3(c[2]) << 2))

    kw = dict(n=n, gsz=group_size, wg=window_groups,
              perception_sq=jnp.float32(perception_radius ** 2),
              separation_sq=jnp.float32(separation_radius ** 2))
    sep, sep_count, align, coh, csum, nb_count, grp = _window_pass(
        pos, vel, col, None, code, **kw)

    if second_pass:
        # Extend rather than wrap: a modulo wrap puts its seam exactly
        # where the old major plane was (seam at grid_dim - shift), so
        # plane-straddling pairs stay split.  Extended coords just use
        # one more Morton bit.
        shift = max(1, (grid_dim * 3) // 7)
        c2 = c + shift
        code2 = (_spread3(c2[0]) | (_spread3(c2[1]) << 1)
                 | (_spread3(c2[2]) << 2))
        kw2 = dict(kw, wg=(pass2_window_groups or window_groups),
                   prev_wg=window_groups)
        sep2, sc2, al2, coh2, cs2, nc2, _ = _window_pass(
            pos, vel, col, grp, code2, **kw2)
        sep = sep + sep2
        sep_count = sep_count + sc2
        align = align + al2
        coh = coh + coh2
        csum = csum + cs2
        nb_count = nb_count + nc2

    force, avg_col = _merge_and_steer(
        sep, sep_count, align, coh, csum, nb_count, pos, vel, col,
        separation_weight, alignment_weight, cohesion_weight,
        max_speed, max_force)
    if return_counts:
        return force, avg_col, nb_count
    return force, avg_col


def _merge_and_steer(sep, sep_count, align, coh, csum, nb_count, pos, vel,
                     col, separation_weight, alignment_weight,
                     cohesion_weight, max_speed, max_force):
    """Merged raw accumulators -> steering force + colour blend target.

    Reference force law flock.py:174-238: each behaviour normalizes its
    accumulator, scales to max_speed, subtracts velocity, clamps to
    max_force, applies its weight — once over the merged accumulators so
    multi-pass capture never double-steers.
    """
    def steer(acc, active, weight):
        mag = jnp.sqrt(jnp.sum(acc * acc, axis=0))
        unit = acc / jnp.maximum(mag, 1e-12)
        s = unit * max_speed - vel
        smag = jnp.sqrt(jnp.sum(s * s, axis=0))
        s = jnp.where(smag > max_force,
                      s * (max_force / jnp.maximum(smag, 1e-12)), s)
        return jnp.where(active & (mag > 0), s * weight, 0.0)

    cnt = jnp.maximum(sep_count, 1).astype(jnp.float32)
    f_sep = steer(sep / cnt, sep_count > 0, separation_weight)
    ncnt = jnp.maximum(nb_count, 1).astype(jnp.float32)
    f_align = steer(align / ncnt, nb_count > 0, alignment_weight)
    f_coh = steer(coh / ncnt - pos, nb_count > 0, cohesion_weight)
    avg_col = jnp.where(nb_count > 0, (csum + col) / (ncnt + 1.0), col)
    return f_sep + f_align + f_coh, avg_col


def boids_codes(pos, *, cell_size, grid_dim, offset, second=False):
    """Morton codes of the (clamped) grid cells; ``second`` applies the
    diagonal 3/7 shift used by the dedup'd second window pass."""
    from spatialsim_tpu.ops.morton import _spread3
    c = cell_coords(pos, cell_size, grid_dim, offset)
    if second:
        c = c + max(1, (grid_dim * 3) // 7)
    return (_spread3(c[0]) | (_spread3(c[1]) << 1) | (_spread3(c[2]) << 2))


def build_boids_orders(pos, *, cell_size, grid_dim, offset, group_size):
    """Frozen order pair for the production stepper, RELATIVE to the
    input layout.

    Returns ``(o1, p21_pad, s21)``: ``o1`` (n,) sorts the input by the
    pass-1 Morton code; ``p21_pad`` (npad,) maps each pass-2 slot to its
    pass-1 slot (tail padded with n-1 duplicates, neutralized by the
    caller); ``s21`` (n,) is the inverse (pass-1 slot -> pass-2 slot).
    """
    n = pos.shape[1]
    gsz = group_size
    npad = ((n + gsz - 1) // gsz) * gsz
    code1 = boids_codes(pos, cell_size=cell_size, grid_dim=grid_dim,
                        offset=offset)
    o1 = jnp.argsort(code1).astype(jnp.int32)
    code2 = boids_codes(pos, cell_size=cell_size, grid_dim=grid_dim,
                        offset=offset, second=True)[o1]
    o2 = jnp.argsort(code2).astype(jnp.int32)       # pass2 slot -> pass1 slot
    p21_pad = jnp.concatenate(
        [o2, jnp.broadcast_to(o2[-1], (npad - n,))])
    s21 = jnp.zeros((n,), jnp.int32).at[o2].set(
        jnp.arange(n, dtype=jnp.int32))
    return o1, p21_pad, s21


def flocking_forces_window_frozen(pos1, vel1, col1, p21_pad, s21, *,
                                  perception_radius, separation_radius,
                                  separation_weight, alignment_weight,
                                  cohesion_weight, max_speed, max_force,
                                  group_size=256, window_groups=2,
                                  pass2_window_groups=0,
                                  second_pass=True, return_counts=False):
    """Window forces on PASS-1-SORTED state with FROZEN orders.

    The production boids path: the state lives sorted by the pass-1
    Morton code and both passes' permutations are rebuilt only every
    ``resort_interval`` steps (models/boids.py) — between rebuilds this
    runs zero argsorts and only the pass-2 permutation gathers (16n vs
    the stateless path's ~33n gathers + 2 sorts per step).  Window
    membership ages between re-sorts; the re-sort interval is chosen so
    drift stays well inside the window slack (tested capture >= 99% at
    interval end, tests/test_boids_window.py).

    Returns (force, avg_col) in pass-1 sorted layout.
    """
    n = pos1.shape[1]
    gsz = group_size
    npad = p21_pad.shape[0]
    pad = npad - n
    kw = dict(gsz=gsz, wg=window_groups,
              perception_sq=jnp.float32(perception_radius ** 2),
              separation_sq=jnp.float32(separation_radius ** 2))

    def padded(a, pos_fill=False):
        if pad == 0:
            return a
        fill = 1e9 if pos_fill else 0.0
        tail = jnp.full((a.shape[0], pad), fill, a.dtype)
        return jnp.concatenate([a, tail], axis=1)

    def flat(a):
        if a.ndim == 3:
            return jnp.moveaxis(a, 0, 1).reshape(3, npad)[:, :n]
        return a.reshape(npad)[:n]

    s_pos1 = padded(pos1, True)
    s_vel1 = padded(vel1)
    s_col1 = padded(col1)
    acc1 = _window_accumulate(s_pos1, s_vel1, s_col1, None, **kw)
    sep, sep_count, align, coh, csum, nb_count = map(flat, acc1)

    if second_pass:
        # Both permutations run as ONE packed gather each way: XLA's
        # random-access cost is per-INDEX, not per-element (measured
        # scripts/gather_bench.py), so the 9 state rows ride one
        # (9, npad)[:, p21] gather and the 14 accumulator rows one
        # (14, npad)[:, s21] — round 2 paid ~15 separate gathers here
        # (~16n memory ops/step, the boids wall at 100K).
        real2 = jnp.arange(npad) < n
        P2 = jnp.concatenate([s_pos1, s_vel1, s_col1],
                             axis=0)[:, p21_pad]              # (9, npad)
        s_pos2 = jnp.where(real2[None, :], P2[0:3], 1e9)
        s_vel2 = P2[3:6]
        s_col2 = P2[6:9]
        g1f = jnp.where(real2, (p21_pad // gsz).astype(jnp.float32),
                        -1e9)[None, :]
        kw2 = dict(kw, wg=(pass2_window_groups or window_groups),
                   prev_wg=window_groups)
        acc2 = _window_accumulate(s_pos2, s_vel2, s_col2, g1f, **kw2)

        sep2, sc2, al2, coh2, cs2, nc2 = acc2
        rows2 = jnp.concatenate(
            [jnp.moveaxis(a, 0, 1).reshape(3, npad)
             for a in (sep2, al2, coh2, cs2)]
            + [sc2.reshape(1, npad).astype(jnp.float32),
               nc2.reshape(1, npad).astype(jnp.float32)], axis=0)
        A = rows2[:, s21]                                     # (14, n)
        sep = sep + A[0:3]
        align = align + A[3:6]
        coh = coh + A[6:9]
        csum = csum + A[9:12]
        sep_count = sep_count + A[12].astype(jnp.int32)
        nb_count = nb_count + A[13].astype(jnp.int32)

    force, avg_col = _merge_and_steer(
        sep, sep_count, align, coh, csum, nb_count, pos1, vel1, col1,
        separation_weight, alignment_weight, cohesion_weight,
        max_speed, max_force)
    if return_counts:
        return force, avg_col, nb_count
    return force, avg_col


def cell_coords(pos, cell_size, grid_dim, offset):
    """Clamped integer cell coordinates, (3, N) int32 (flock.py:17-27)."""
    c = jnp.floor((pos + offset) / cell_size).astype(jnp.int32)
    return jnp.clip(c, 0, grid_dim - 1)


def cell_index(pos, cell_size, grid_dim, offset):
    c = cell_coords(pos, cell_size, grid_dim, offset)
    return c[0] + c[1] * grid_dim + c[2] * grid_dim * grid_dim


@functools.partial(
    jax.jit,
    static_argnames=("grid_dim", "cell_range", "cell_capacity", "chunk"))
def flocking_forces(pos, vel, col, *, cell_size, grid_dim, offset,
                    perception_radius, separation_radius, separation_weight,
                    alignment_weight, cohesion_weight, max_speed, max_force,
                    cell_range=1, cell_capacity=16, chunk=4096):
    """Per-boid steering forces and neighbourhood-average colours.

    Args:
      pos, vel, col: ``(3, N)`` float32.
    Returns:
      (force (3, N), avg_col (3, N)) — force is the summed, weighted
      separation+alignment+cohesion steering; avg_col is the blend target
      (equals ``col`` where a boid has no neighbours).
    """
    n = pos.shape[1]
    ids = cell_index(pos, cell_size, grid_dim, offset)
    order = jnp.argsort(ids)
    sorted_ids = ids[order]

    coords = cell_coords(pos, cell_size, grid_dim, offset)

    # Static 27-cell (or larger, for cell_range > 1) neighbourhood offsets.
    r = cell_range
    span = 2 * r + 1
    d = jnp.arange(-r, r + 1, dtype=jnp.int32)
    dxg, dyg, dzg = jnp.meshgrid(d, d, d, indexing="ij")
    doff = jnp.stack([dxg.ravel(), dyg.ravel(), dzg.ravel()])  # (3, 27)
    n_cells = span ** 3

    perception_sq = jnp.float32(perception_radius * perception_radius)
    separation_sq = jnp.float32(separation_radius * separation_radius)
    cap = cell_capacity

    sorted_pos = pos[:, order]
    sorted_vel = vel[:, order]
    sorted_col = col[:, order]

    def one_chunk(start):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, chunk, axis=-1)
        p_i = sl(pos)                      # (3, C)
        v_i = sl(vel)
        c_i = sl(coords)                   # (3, C)

        # Neighbour cell ids for every boid in the chunk: (C, 27).
        nc = c_i[:, :, None] + doff[:, None, :]            # (3, C, 27)
        in_range = jnp.all((nc >= 0) & (nc < grid_dim), axis=0)
        ncell = nc[0] + nc[1] * grid_dim + nc[2] * grid_dim * grid_dim

        starts = jnp.searchsorted(sorted_ids, ncell.ravel(), side="left")
        ends = jnp.searchsorted(sorted_ids, ncell.ravel(), side="right")
        starts = starts.reshape(chunk, n_cells)
        counts = (ends.reshape(chunk, n_cells) - starts)

        # Fixed-capacity gather window per neighbour cell: (C, 27, cap).
        k = jnp.arange(cap, dtype=jnp.int32)
        gidx = starts[:, :, None] + k[None, None, :]
        valid = (k[None, None, :] < counts[:, :, None]) & in_range[:, :, None]
        gidx = jnp.clip(gidx, 0, n - 1).reshape(chunk, n_cells * cap)
        valid = valid.reshape(chunk, n_cells * cap)

        p_j = sorted_pos[:, gidx]          # (3, C, M)
        v_j = sorted_vel[:, gidx]
        col_j = sorted_col[:, gidx]

        dd = p_i[:, :, None] - p_j         # d = p_i - p_j (flock.py:145-148)
        dist_sq = jnp.sum(dd * dd, axis=0)
        is_nb = valid & (dist_sq < perception_sq) & (dist_sq > 0.0001)
        is_sep = is_nb & (dist_sq < separation_sq)

        inv_dist = jax.lax.rsqrt(jnp.maximum(dist_sq, 1e-12))
        wsep = jnp.where(is_sep, inv_dist * inv_dist, 0.0)
        sep = jnp.sum(wsep[None] * dd, axis=2)             # (3, C)
        sep_count = jnp.sum(is_sep, axis=1)

        nbf = is_nb.astype(jnp.float32)[None]
        align = jnp.sum(nbf * v_j, axis=2)
        coh = jnp.sum(nbf * p_j, axis=2)
        csum = jnp.sum(nbf * col_j, axis=2)
        nb_count = jnp.sum(is_nb, axis=1)

        def steer(acc, active, weight):
            mag = jnp.sqrt(jnp.sum(acc * acc, axis=0))
            unit = acc / jnp.maximum(mag, 1e-12)
            s = unit * max_speed - v_i
            smag = jnp.sqrt(jnp.sum(s * s, axis=0))
            s = jnp.where(smag > max_force, s * (max_force / jnp.maximum(smag, 1e-12)), s)
            return jnp.where(active & (mag > 0), s * weight, 0.0)

        cnt = jnp.maximum(sep_count, 1).astype(jnp.float32)
        f_sep = steer(sep / cnt, sep_count > 0, separation_weight)
        ncnt = jnp.maximum(nb_count, 1).astype(jnp.float32)
        f_align = steer(align / ncnt, nb_count > 0, alignment_weight)
        f_coh = steer(coh / ncnt - p_i, nb_count > 0, cohesion_weight)

        c_self = sl(col)
        avg_col = jnp.where(nb_count > 0,
                            (csum + c_self) / (ncnt + 1.0), c_self)
        return f_sep + f_align + f_coh, avg_col

    n_chunks = (n + chunk - 1) // chunk
    n_pad = n_chunks * chunk
    if n_pad != n:
        pad = n_pad - n
        pos = jnp.pad(pos, ((0, 0), (0, pad)))
        vel = jnp.pad(vel, ((0, 0), (0, pad)))
        col = jnp.pad(col, ((0, 0), (0, pad)))
        coords = jnp.pad(coords, ((0, 0), (0, pad)))

    starts = jnp.arange(n_chunks) * chunk
    forces, avg_cols = jax.lax.map(one_chunk, starts)      # (n_chunks, 3, C)
    force = jnp.moveaxis(forces, 0, 1).reshape(3, n_pad)[:, :n]
    avg_col = jnp.moveaxis(avg_cols, 0, 1).reshape(3, n_pad)[:, :n]
    return force, avg_col


def boids_physics(pos, vel, col, force, avg_col, *, bounds, margin,
                  wall_force, max_speed, color_blend, dt):
    """Wall springs, integrate, speed clamp, colour blend (flock.py:241-308)."""
    over = pos - (bounds - margin)
    under = (-bounds + margin) - pos
    wall = (-jnp.minimum(over / margin * 2.0, 1.0) * (over > 0)
            + jnp.minimum(under / margin * 2.0, 1.0) * (under > 0)) * wall_force
    acc = force + wall
    vel = vel + acc * dt
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=0, keepdims=True))
    vel = jnp.where(speed > max_speed, vel * (max_speed / jnp.maximum(speed, 1e-12)), vel)
    pos = pos + vel * dt
    col = col + (avg_col - col) * color_blend
    return pos, vel, col
