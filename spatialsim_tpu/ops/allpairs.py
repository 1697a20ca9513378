"""Tiled all-pairs gravitational forces.

The TPU-native replacement for the reference's brute-force GPU backends:
the numba.cuda tiled shared-memory kernel (reference
``nbody/gpu_backend.py:177-240``, TILE_SIZE=256), the Metal
``compute_forces_tiled`` shader (``nbody/metal/barnes_hut.metal:212-266``)
and the PyTorch-MPS tiled tensor path (``nbody/gpu_backend.py:457-501``).

Physics per pair (identical to the reference's accept branch,
``nbody/simulation.py:247-266``):

    d        = p_j - p_i
    dist_sq  = |d|^2 + softening^2
    a_i     += G * m_j * d / dist_sq^(3/2)      if dist_sq > softening^2

The ``dist_sq > softening^2`` guard excludes self-interaction (r = 0) without
any index bookkeeping — exactly the reference's semantics.

Two implementations:

* :func:`allpairs_accel_reference` — plain broadcasted XLA; the correctness
  oracle for unit tests and the small-N fallback.
* :func:`allpairs_accel` — Pallas kernel tiling bodies into VMEM blocks; the
  j-bodies stream through the (i, j) grid exactly like the reference's CUDA
  shared-memory tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def allpairs_accel_reference(pos, mass, G, softening):
    """O(N^2) accelerations via one broadcasted XLA program.

    Args:
      pos: ``(3, N)`` float32 positions.
      mass: ``(N,)`` float32 masses.
    Returns:
      ``(3, N)`` float32 accelerations.
    """
    soft_sq = jnp.float32(softening * softening)
    # (3, N, 1) -> (3, 1, N) pairwise diffs; d[c, i, j] = p[c, j] - p[c, i]
    d = pos[:, None, :] - pos[:, :, None]
    dist_sq = jnp.sum(d * d, axis=0) + soft_sq
    inv_d3 = jax.lax.rsqrt(dist_sq) / dist_sq
    w = jnp.where(dist_sq > soft_sq, G * mass[None, :] * inv_d3, 0.0)
    return jnp.sum(w[None, :, :] * d, axis=2).astype(jnp.float32)


def _allpairs_kernel(pos_i_ref, pos_j_ref, mass_j_ref, out_ref, *, G, soft_sq, n):
    """One (i-block, j-block) tile of the pairwise force sum.

    pos_i_ref: (8, TI)  — components x,y,z in sublanes 0..2 (rest padding)
    pos_j_ref: (8, TJ)
    mass_j_ref: (8, TJ) — mass in sublane 0
    out_ref:   (8, TI)  — accumulated accel components in sublanes 0..2
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ti = pos_i_ref.shape[1]
    tj = pos_j_ref.shape[1]

    xi = pos_i_ref[0, :].reshape(ti, 1)
    yi = pos_i_ref[1, :].reshape(ti, 1)
    zi = pos_i_ref[2, :].reshape(ti, 1)
    xj = pos_j_ref[0, :].reshape(1, tj)
    yj = pos_j_ref[1, :].reshape(1, tj)
    zj = pos_j_ref[2, :].reshape(1, tj)
    mj = mass_j_ref[0, :].reshape(1, tj)

    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    dist_sq = dx * dx + dy * dy + dz * dz + soft_sq
    inv_d = jax.lax.rsqrt(dist_sq)
    w = (G * mj) * inv_d * (inv_d * inv_d)
    # Mask self/coincident pairs and j-padding (padded masses are zero, but
    # the dist guard is the physics contract; keep both).
    col = jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1) + j * tj
    w = jnp.where((dist_sq > soft_sq) & (col < n), w, 0.0)

    ax = jnp.sum(w * dx, axis=1)
    ay = jnp.sum(w * dy, axis=1)
    az = jnp.sum(w * dz, axis=1)
    acc = jnp.concatenate(
        [ax.reshape(1, ti), ay.reshape(1, ti), az.reshape(1, ti),
         jnp.zeros((5, ti), jnp.float32)], axis=0)
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("G", "softening", "tile_i", "tile_j"))
def allpairs_accel(pos, mass, G, softening, tile_i=256, tile_j=1024):
    """Tiled Pallas all-pairs accelerations.

    Args:
      pos: ``(3, N)`` float32 positions.
      mass: ``(N,)`` float32 masses.
    Returns:
      ``(3, N)`` float32 accelerations.
    """
    n = pos.shape[1]
    ti = min(tile_i, max(128, 1 << (n - 1).bit_length()))
    tj = min(tile_j, max(128, 1 << (n - 1).bit_length()))
    n_pad = ((n + max(ti, tj) - 1) // max(ti, tj)) * max(ti, tj)

    # Pack into (8, n_pad) sublane-aligned panels: x,y,z in sublanes 0-2.
    pad = n_pad - n
    pos8 = jnp.concatenate(
        [pos, jnp.zeros((5, n), jnp.float32)], axis=0)
    pos8 = jnp.pad(pos8, ((0, 0), (0, pad)))
    mass8 = jnp.pad(mass[None, :], ((0, 7), (0, pad)))

    grid = (n_pad // ti, n_pad // tj)
    # Interpret on non-TPU backends so the same tests run on the CPU mesh.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_allpairs_kernel, G=float(G),
                          soft_sq=float(softening) * float(softening), n=n),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, ti), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, ti), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=14 * n_pad * n_pad, bytes_accessed=16 * n_pad * 2,
            transcendentals=n_pad * n_pad),
        interpret=interpret,
    )(pos8, pos8, mass8)
    return out[:3, :n]
