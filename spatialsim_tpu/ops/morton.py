"""Morton (Z-order) encoding of 3D positions.

The TPU-native octree (see :mod:`spatialsim_tpu.ops.octree`) replaces the
reference's sequential insertion builder (``nbody/simulation.py:63-198``,
``nbody/metal/metal_backend.py:66-217``) with a fully parallel pipeline:
quantize positions onto a ``2^depth`` dyadic grid, interleave bits into
Morton codes, sort.  A Morton-sorted body array makes every octree cell — at
every level — a contiguous run, which is what lets the rest of the pipeline
be segment-sums and gathers instead of pointer chasing.

The dyadic cells agree exactly with the reference's recursive octant split
(``nbody/simulation.py:52-60``): the root cube is ``[-half, half]^3`` and
child ``k`` of a cell is selected by the (x>=cx, y>=cy, z>=cz) bit triple.
"""

from __future__ import annotations

import jax.numpy as jnp


def _spread3(x):
    """Spread the low 10 bits of ``x`` so bit i lands at position 3*i.

    Standard magic-constant bit dilation (public-domain technique); operates
    on int32 lanes on the VPU.
    """
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_encode(pos, half, depth):
    """Morton codes for positions in the cube ``[-half, half]^3``.

    Args:
      pos: ``(3, N)`` float32 positions.
      half: scalar half-extent of the root cell (from
        :func:`spatialsim_tpu.ops.bounds.compute_bounds`).
      depth: static int, bits per axis (max 10 → 30-bit codes in int32).

    Returns:
      ``(N,)`` int32 codes.  Out-of-cube positions are clamped to the
      boundary cells (the reference clamps the same way by construction:
      its bounds always contain all bodies).
    """
    if not (1 <= depth <= 10):
        raise ValueError("depth must be in [1, 10] for int32 codes")
    scale = (2 ** depth) / (2.0 * half)
    q = jnp.floor((pos + half) * scale).astype(jnp.int32)
    q = jnp.clip(q, 0, 2 ** depth - 1)
    # Axis order (x, y, z) -> bits (0, 1, 2) matches the reference's octant
    # convention (x -> bit0, y -> bit1, z -> bit2; simulation.py:38-49).
    return (_spread3(q[0]) | (_spread3(q[1]) << 1) | (_spread3(q[2]) << 2))


def cell_center(code, level, depth, half):
    """Geometric center of the cell ``code >> 3*(depth-level)`` at ``level``.

    Inverse of :func:`morton_encode` at coarser levels; used by tests and
    diagnostics (the traversal itself only needs centers of mass).
    """
    shift = 3 * (depth - level)
    c = code >> shift
    side = 2.0 * half / (2 ** level)

    def compact(x):
        # Inverse of _spread3 on the low 3*level bits.
        x = x & 0x09249249
        x = (x | (x >> 2)) & 0x030C30C3
        x = (x | (x >> 4)) & 0x0300F00F
        x = (x | (x >> 8)) & 0x030000FF
        x = (x | (x >> 16)) & 0x3FF
        return x

    ix = compact(c)
    iy = compact(c >> 1)
    iz = compact(c >> 2)
    grid = jnp.stack([ix, iy, iz]).astype(jnp.float32)
    return -half + (grid + 0.5) * side
