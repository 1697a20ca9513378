"""Linear octree built bottom-up from Morton-sorted bodies.

TPU-native replacement for the reference's sequential-insert builders
(``nbody/simulation.py:63-198`` — one body at a time into a pointer tree —
and the packed variant ``nbody/metal/metal_backend.py:66-217``).  Sequential
insertion is inherently serial; here the whole tree is built with sorts,
cumulative sums and segment reductions, all of which XLA parallelizes:

1. Bodies are Morton-sorted (:mod:`spatialsim_tpu.ops.morton`), so the
   bodies of any octree cell at any level form one contiguous run.
2. The deepest level's cells are the unique Morton codes; run boundaries
   (``code[i] != code[i-1]``) give each body a dense cell rank, and
   segment-sums produce mass / mass-weighted-position / count per cell.
3. Each coarser level pools its children with the same trick on
   ``code >> 3`` — a hierarchical (pairwise-like) summation that is also
   numerically friendlier than the reference's running COM average
   (``simulation.py:160-167``).

Everything is fixed-capacity: level ``d`` holds ``min(8^d, N)`` slots,
empty slots carry the sentinel code ``INT32_MAX`` and zero mass, so the
whole build jits with static shapes.

Semantics preserved from the reference:
  * node mass = Σ body masses, COM = mass-weighted mean (``:160-167``);
  * dyadic cell geometry from the recursive octant split (``:52-60``);
  * cells exist only where bodies are (compacted, like the insert tree).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

SENTINEL = jnp.iinfo(jnp.int32).max


class OctreeLevel(NamedTuple):
    """Compacted cells of one octree level, sorted by Morton code.

    All arrays have static length ``capacity(level)``; entries past
    ``n_cells`` are empty (code == SENTINEL, mass == 0, count == 0).
    """

    code: jax.Array         # (C,) int32 Morton prefix of the cell
    mass: jax.Array         # (C,) f32 total mass
    com: jax.Array          # (3, C) f32 center of mass
    vel: jax.Array          # (3, C) f32 mass-weighted mean velocity
    count: jax.Array        # (C,) int32 number of bodies
    body_start: jax.Array   # (C,) int32 first body (into the sorted order)
    child_start: jax.Array  # (C,) int32 first child slot in the next level
    child_count: jax.Array  # (C,) int32 number of children (0 at max depth)
    n_cells: jax.Array      # () int32 number of occupied slots
    # Central second mass moments Σ m·δδᵀ about the cell COM, rows
    # (xx, yy, zz, xy, xz, yz); None unless built with_quadrupole.  Kept
    # COM-central (all-small quantities) so f32 never cancels large
    # world-coordinate products.
    m2: jax.Array | None = None
    # Mass-weighted mean acceleration (3, C); None unless sorted_acc was
    # given.  Lets frozen far entries advance to second order
    # (com + v·τ + a·τ²/2) — the ballistic first-order advance underpins
    # a ~½|a|τ² position error that dominates stale-list force error in
    # high-curvature regions (galaxy cores), measured in
    # scripts/staleness_scan.py.
    acc: jax.Array | None = None


class Octree(NamedTuple):
    levels: List[OctreeLevel]   # index 0 = coarsest built level
    start_level: int            # tree depth of levels[0]
    max_depth: int              # tree depth of levels[-1]
    half: jax.Array             # () f32 root half-extent


def level_capacity(level: int, n: int) -> int:
    """Static slot count for one level: can't exceed 8^level or N."""
    return int(min(8 ** level, n))


def _ranks(codes):
    """Dense segment ids from sorted codes: 0,0,1,2,2,2,... plus count."""
    flags = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (codes[1:] != codes[:-1]).astype(jnp.int32)])
    rank = jnp.cumsum(flags) - 1
    return rank, rank[-1] + 1


def _segment(data, seg, num):
    return jax.ops.segment_sum(data, seg, num_segments=num)


def _scatter_min(init_val, size, seg, values):
    return jnp.full((size,), init_val, values.dtype).at[seg].min(values)


def _outer6(d):
    """Second-moment component rows (xx, yy, zz, xy, xz, yz) of ``d`` (3, K)."""
    return jnp.stack([d[0] * d[0], d[1] * d[1], d[2] * d[2],
                      d[0] * d[1], d[0] * d[2], d[1] * d[2]])


@functools.partial(jax.jit, static_argnames=("max_depth", "start_level", "n",
                                             "with_quadrupole",
                                             "level_caps"))
def build_octree(sorted_codes, sorted_pos, sorted_mass, half, *,
                 max_depth, start_level=2, n=None, sorted_vel=None,
                 sorted_acc=None, with_quadrupole=False, level_caps=()):
    """Build all levels from Morton-sorted bodies.

    Args:
      sorted_codes: ``(N,)`` int32 Morton codes, ascending.
      sorted_pos: ``(3, N)`` f32 positions in the same order.
      sorted_mass: ``(N,)`` f32 masses (padding bodies carry mass 0).
      half: scalar root half-extent.
      max_depth: static octree depth (= Morton bits per axis).
      start_level: static coarsest level to materialize (the traversal's
        initial frontier is every cell of this level).
      sorted_vel: optional ``(3, N)`` velocities — when given, each cell
        also carries its mass-weighted mean velocity (used to freeze far
        cells ballistically in ops/bh_window.py).
      sorted_acc: optional ``(3, N)`` accelerations — when given, cells
        carry the mean acceleration too (second-order entry advance).
      level_caps: optional static per-level slot counts, index
        ``level - start_level`` — occupancy-calibrated TIGHT caps
        (bh_window.calibrate_config).  The default ``min(8^d, N)`` is
        safe but loose: at 1M bodies the two deepest levels carry ~1M
        slots each against ~37K/169K occupied cells, and every
        build/pool pass pays the full static width.  Overflow (more
        occupied cells than slots) degrades gracefully, never UB: tail
        cells merge into the cap's last slot (mass-conserving), and a
        parent whose child run touches that merged slot reports ZERO
        children, so the traversal emits it as a coarse monopole
        instead of double-visiting merged cells.

    Returns:
      :class:`Octree` with ``max_depth - start_level + 1`` levels.
    """
    if n is None:
        n = sorted_codes.shape[0]
    if sorted_vel is None:
        sorted_vel = jnp.zeros_like(sorted_pos)
    if level_caps:
        assert len(level_caps) == max_depth - start_level + 1

    def cap_of(level):
        full = level_capacity(level, n)
        if not level_caps:
            return full
        return min(int(level_caps[level - start_level]), full)

    # --- deepest level from bodies ---
    seg, n_cells = _ranks(sorted_codes)
    cap = cap_of(max_depth)
    raw_cells = n_cells
    seg = jnp.minimum(seg, cap - 1)
    n_cells = jnp.minimum(n_cells, cap)
    mass = _segment(sorted_mass, seg, cap)
    wpos = _segment((sorted_pos * sorted_mass[None, :]).T, seg, cap).T
    wvel = _segment((sorted_vel * sorted_mass[None, :]).T, seg, cap).T
    wacc = (None if sorted_acc is None else
            _segment((sorted_acc * sorted_mass[None, :]).T, seg, cap).T)
    count = _segment(jnp.ones_like(seg), seg, cap)
    code = _scatter_min(SENTINEL, cap, seg, sorted_codes)
    body_start = _scatter_min(
        n, cap, seg, jnp.arange(n, dtype=jnp.int32))
    inv_m = 1.0 / jnp.maximum(mass, 1e-30)[None, :]
    com = wpos * inv_m
    m2 = None
    if with_quadrupole:
        # Body offsets from their own cell's COM are cell-sized (small),
        # so the products below carry full f32 precision — computing raw
        # moments about the origin instead would cancel ~(s/|x|)² of it.
        d = sorted_pos - com[:, seg]
        m2 = _segment((_outer6(d) * sorted_mass[None, :]).T, seg, cap).T
    deepest = OctreeLevel(
        code=code, mass=mass, com=com, vel=wvel * inv_m,
        count=count, body_start=body_start,
        child_start=jnp.zeros((cap,), jnp.int32),
        child_count=jnp.zeros((cap,), jnp.int32), n_cells=n_cells, m2=m2,
        acc=None if wacc is None else wacc * inv_m)

    # --- pool upward ---
    levels = [deepest]
    child = deepest
    for level in range(max_depth - 1, start_level - 1, -1):
        ccap = child.code.shape[0]
        child_overflow = raw_cells > ccap
        pcap = cap_of(level)
        parent_code = jnp.where(child.code == SENTINEL, SENTINEL,
                                child.code >> 3)
        pseg, pn = _ranks(parent_code)
        raw_cells = pn - jnp.any(child.code == SENTINEL).astype(jnp.int32)
        pseg = jnp.minimum(pseg, pcap - 1)
        # Empty child slots all share the SENTINEL "segment"; kick them out
        # of range so segment ops drop them (and fix the occupied count).
        invalid = child.code == SENTINEL
        pseg = jnp.where(invalid, pcap, pseg)
        pn = jnp.minimum(raw_cells, pcap)

        pmass = _segment(child.mass, pseg, pcap)
        pwpos = _segment((child.com * child.mass[None, :]).T, pseg, pcap).T
        pwvel = _segment((child.vel * child.mass[None, :]).T, pseg, pcap).T
        pwacc = (None if child.acc is None else
                 _segment((child.acc * child.mass[None, :]).T, pseg,
                          pcap).T)
        pcount = _segment(child.count, pseg, pcap)
        pcode = _scatter_min(SENTINEL, pcap, pseg, parent_code)
        pbody = _scatter_min(n, pcap, pseg, child.body_start)
        cstart = _scatter_min(ccap, pcap, pseg,
                              jnp.arange(ccap, dtype=jnp.int32))
        ccount = _segment(jnp.ones_like(pseg), pseg, pcap)
        # Child-level overflow: the cap's last slot holds MERGED tail
        # cells.  A parent whose child run touches it must not be opened
        # (expanding into the merged slot would double-count mass) — it
        # keeps ccount 0 and the traversal emits it as a coarse
        # monopole; its own moments are exact either way.
        ccount = jnp.where(child_overflow & (cstart + ccount > ccap - 1),
                           0, ccount)
        pinv_m = 1.0 / jnp.maximum(pmass, 1e-30)[None, :]
        pcom = pwpos * pinv_m
        pm2 = None
        if with_quadrupole:
            # Parallel-axis merge: M2_p = Σ_c [M2_c + m_c·outer(com_c−com_p)]
            # — every operand is COM-relative (small), so f32-safe.
            d = child.com - pcom[:, jnp.clip(pseg, 0, pcap - 1)]
            contrib = child.m2 + _outer6(d) * child.mass[None, :]
            pm2 = _segment(contrib.T, pseg, pcap).T
        parent = OctreeLevel(
            code=pcode, mass=pmass, com=pcom, vel=pwvel * pinv_m,
            count=pcount, body_start=pbody,
            child_start=cstart, child_count=ccount, n_cells=pn, m2=pm2,
            acc=None if pwacc is None else pwacc * pinv_m)
        levels.append(parent)
        child = parent

    levels.reverse()
    return Octree(levels=levels, start_level=start_level,
                  max_depth=max_depth, half=jnp.asarray(half, jnp.float32))
