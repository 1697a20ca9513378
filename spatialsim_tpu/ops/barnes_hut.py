"""Barnes-Hut accelerations via group-synchronous octree traversal.

TPU-native replacement for the reference's per-body stack traversals
(``nbody/simulation.py:201-278`` Numba, ``nbody/metal/barnes_hut.metal:39-114``
Metal).  A per-body divergent stack walk is the worst possible shape for a
vector machine, so the design is re-thought:

* Bodies are Morton-sorted and partitioned into **groups** of ``group_size``
  contiguous bodies.  Spatially-close bodies visit near-identical node sets,
  so one traversal per group replaces ``group_size`` per-body walks.
* The walk is **level-synchronous**: a fixed-capacity frontier of octree
  cells descends one level per iteration (a statically-unrolled loop —
  XLA-friendly control flow, no divergence).
* Cell disposition per level, strongest-to-weakest approximation order:
    1. **θ-accept**: conservative group criterion ``side < θ · d_min`` where
       ``d_min`` is the distance from the group's AABB to the cell's COM
       (plus the reference's softening term) — every body in the group then
       satisfies the reference's per-body ``s/d < θ``
       (``simulation.py:256-258``), so the approximation is never weaker
       than the reference's.
    2. **near-exact**: cells with ``count <= leaf_size`` contribute their
       actual bodies (the reference's leaf = direct-interaction case,
       ``simulation.py:245,260-266``).
    3. **open**: push the children into the next level's frontier.
  Capacity overflow (frontier or near-list) degrades to a **forced
  monopole** of the offending cell — coarser physics, never a silent drop
  (the reference silently drops children on stack overflow,
  ``simulation.py:272``; we do strictly better).
* Force evaluation is dense and masked: group bodies × frontier cells per
  level, plus group bodies × gathered near bodies at the end — pure
  VPU-vectorizable arithmetic with static shapes.

Force law identical to the all-pairs kernel and the reference accept branch
(``simulation.py:247-266``): ``dist² = |Δ|² + softening²``; contribution
``G·m·Δ/dist³`` gated by ``mass > 0`` and ``dist² > softening²``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spatialsim_tpu.ops.bounds import compute_bounds
from spatialsim_tpu.ops.morton import morton_encode
from spatialsim_tpu.ops.octree import build_octree


def _exclusive_cumsum(x):
    return jnp.cumsum(x) - x


def _pair_accel(gpos, src_pos, src_mass, active, G, soft_sq):
    """Masked monopole/body forces: sources (3, S) onto group bodies (3, Gs).

    Returns (3, Gs) accelerations summed over sources.
    """
    d = src_pos[:, None, :] - gpos[:, :, None]          # (3, Gs, S)
    dist_sq = jnp.sum(d * d, axis=0) + soft_sq          # (Gs, S)
    inv = jax.lax.rsqrt(dist_sq)
    w = jnp.where(active[None, :] & (dist_sq > soft_sq),
                  (G * src_mass)[None, :] * inv * inv * inv, 0.0)
    return jnp.sum(w[None, :, :] * d, axis=2)


def _traverse_group(gpos, gmass, bbox_min, bbox_max, tree, sorted_pos,
                    sorted_mass, *, theta, G, soft_sq, leaf_size,
                    frontier_cap, near_ranges, n):
    """Accelerations for one group of Morton-contiguous bodies."""
    levels = tree.levels
    n_levels = len(levels)
    F = frontier_cap
    R = near_ranges

    acc = jnp.zeros_like(gpos)
    # Initial frontier: every cell of the start level (cap <= F by config).
    c0 = levels[0].code.shape[0]
    init = jnp.arange(F, dtype=jnp.int32)
    frontier = jnp.where(init < jnp.minimum(c0, levels[0].n_cells), init, -1)

    near_start = jnp.zeros((R,), jnp.int32)
    near_count = jnp.zeros((R,), jnp.int32)
    near_n = jnp.int32(0)

    theta_sq = theta * theta

    for li in range(n_levels):
        lv = levels[li]
        level = tree.start_level + li
        side = 2.0 * tree.half / (2 ** level)
        last = li == n_levels - 1

        valid = frontier >= 0
        idx = jnp.clip(frontier, 0, lv.code.shape[0] - 1)
        cmass = jnp.where(valid, lv.mass[idx], 0.0)
        ccom = lv.com[:, idx]
        ccount = jnp.where(valid, lv.count[idx], 0)

        # Conservative group criterion: distance from group AABB to COM.
        gap = jnp.maximum(bbox_min[:, None] - ccom, ccom - bbox_max[:, None])
        gap = jnp.maximum(gap, 0.0)
        dmin_sq = jnp.sum(gap * gap, axis=0) + soft_sq
        accept = valid & (side * side < theta_sq * dmin_sq)

        leafish = valid & ~accept & (ccount <= leaf_size)
        if last:
            # Can't descend further: anything still open becomes a monopole.
            accept = accept | (valid & ~accept & (ccount > leaf_size))
            open_ = jnp.zeros_like(valid)
        else:
            open_ = valid & ~accept & ~leafish

        # Near-list append; overflow degrades to monopole.
        npos = near_n + _exclusive_cumsum(leafish.astype(jnp.int32))
        near_ovf = leafish & (npos >= R)
        accept = accept | near_ovf
        take = leafish & ~near_ovf
        slot = jnp.where(take, npos, R)
        near_start = near_start.at[slot].set(
            jnp.where(valid, lv.body_start[idx], 0), mode="drop")
        near_count = near_count.at[slot].set(ccount, mode="drop")
        near_n = near_n + jnp.sum(take.astype(jnp.int32))

        if not last:
            # Children of cells we keep open; cells whose children would
            # overflow the next frontier degrade to monopole instead.
            cc = jnp.where(open_, lv.child_count[idx], 0)
            offs = _exclusive_cumsum(cc)
            ovf = open_ & (offs + cc > F)
            accept = accept | ovf
            open_ = open_ & ~ovf
            cc = jnp.where(open_, cc, 0)
            offs = _exclusive_cumsum(cc)

            cs = jnp.where(open_, lv.child_start[idx], 0)
            j = jnp.arange(8, dtype=jnp.int32)
            cand = (cs[:, None] + j[None, :]).reshape(-1)
            tpos = (offs[:, None] + j[None, :]).reshape(-1)
            cvalid = (j[None, :] < cc[:, None]).reshape(-1)
            tpos = jnp.where(cvalid, tpos, F)
            next_frontier = jnp.full((F,), -1, jnp.int32)
            frontier = next_frontier.at[tpos].set(cand, mode="drop")

        # Far-field: masked monopole evaluation of this level's accepted
        # cells.  (mass > 0 re-checked inside; reference simulation.py:260.)
        acc = acc + _pair_accel(gpos, ccom, cmass, accept & (cmass > 0),
                                G, soft_sq)

    # Near-field: gather the listed body ranges and interact directly.
    k = jnp.arange(leaf_size, dtype=jnp.int32)
    bidx = near_start[:, None] + k[None, :]               # (R, leaf)
    nvalid = (k[None, :] < near_count[:, None]).reshape(-1)
    bidx = jnp.clip(bidx.reshape(-1), 0, n - 1)
    bpos = sorted_pos[:, bidx]
    bmass = jnp.where(nvalid, sorted_mass[bidx], 0.0)
    acc = acc + _pair_accel(gpos, bpos, bmass, nvalid & (bmass > 0),
                            G, soft_sq)
    return acc


@functools.partial(
    jax.jit,
    static_argnames=("theta", "G", "softening", "max_depth", "leaf_size",
                     "group_size", "frontier_cap", "near_ranges",
                     "start_level", "group_chunk"))
def barnes_hut_accel_impl(pos, mass, *, theta, G, softening, max_depth=10,
                          leaf_size=8, group_size=256, frontier_cap=512,
                          near_ranges=256, start_level=2, group_chunk=64):
    """Barnes-Hut accelerations, one jitted program.

    Args:
      pos: ``(3, N)`` float32 positions.
      mass: ``(N,)`` float32 masses.
    Returns:
      ``(3, N)`` float32 accelerations.
    """
    n = pos.shape[1]
    half = compute_bounds(pos)
    codes = morton_encode(pos, half, max_depth)
    order = jnp.argsort(codes)

    # Pad the *sorted* stream to a whole number of groups with zero-mass
    # clones of the last body (they join its cell; zero mass => no force).
    gsz = group_size
    npad = ((n + gsz - 1) // gsz) * gsz
    pad = npad - n
    sorted_codes = jnp.concatenate(
        [codes[order], jnp.broadcast_to(codes[order[-1]], (pad,))])
    sorted_pos = jnp.concatenate(
        [pos[:, order], jnp.broadcast_to(pos[:, order[-1]][:, None],
                                         (3, pad))], axis=1)
    sorted_mass = jnp.concatenate([mass[order], jnp.zeros((pad,))])

    if 8 ** start_level > frontier_cap:
        raise ValueError("start_level cells exceed frontier capacity")
    tree = build_octree(sorted_codes, sorted_pos, sorted_mass, half,
                        max_depth=max_depth, start_level=start_level, n=npad)

    n_groups = npad // gsz
    gpos = sorted_pos.reshape(3, n_groups, gsz)
    gmass = sorted_mass.reshape(n_groups, gsz)
    bbox_min = jnp.min(gpos, axis=2).T                    # (n_groups, 3)
    bbox_max = jnp.max(gpos, axis=2).T

    traverse = functools.partial(
        _traverse_group, tree=tree, sorted_pos=sorted_pos,
        sorted_mass=sorted_mass, theta=float(theta), G=float(G),
        soft_sq=float(softening) * float(softening), leaf_size=leaf_size,
        frontier_cap=frontier_cap, near_ranges=near_ranges, n=npad)
    vtraverse = jax.vmap(traverse)

    # Chunk the group axis with lax.map to bound the live intermediates
    # (each chunk's (chunk, 3, gsz, F) products stay ~tens of MB).
    chunk = min(group_chunk, n_groups)
    if n_groups % chunk != 0:
        chunk = n_groups  # tiny problems: single chunk
    gp = jnp.moveaxis(gpos, 1, 0).reshape(n_groups // chunk, chunk, 3, gsz)
    gm = gmass.reshape(n_groups // chunk, chunk, gsz)
    bmin = bbox_min.reshape(n_groups // chunk, chunk, 3)
    bmax = bbox_max.reshape(n_groups // chunk, chunk, 3)

    acc_chunks = jax.lax.map(
        lambda args: vtraverse(*args), (gp, gm, bmin, bmax))
    acc_sorted = jnp.moveaxis(
        acc_chunks.reshape(n_groups, 3, gsz), 0, 1).reshape(3, npad)

    # Scatter back to the caller's body order.
    out = jnp.zeros((3, n), jnp.float32)
    return out.at[:, order].set(acc_sorted[:, :n])


def barnes_hut_accel(pos, mass, config):
    """Config-driven wrapper used by the model layer."""
    from spatialsim_tpu.config.nbody import resolve_config
    config = resolve_config(config, pos.shape[1])
    return barnes_hut_accel_impl(
        pos, mass, theta=config.theta, G=config.G,
        softening=config.softening, max_depth=config.max_depth,
        leaf_size=config.leaf_size, group_size=config.group_size,
        frontier_cap=config.frontier_capacity,
        near_ranges=config.near_capacity // config.leaf_size,
        start_level=2)
