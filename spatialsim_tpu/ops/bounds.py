"""Dynamic simulation bounds.

Reference ``nbody/simulation.py:308-317``: the octree root extent each step
is ``max(|coord|) * 1.1 + 10`` — a single max-reduction, recomputed every
step because bodies are unbounded.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_bounds(pos):
    """Half-extent of the root cube centred at the origin.

    Args:
      pos: ``(3, N)`` positions.
    Returns:
      scalar float32 half-extent.
    """
    return jnp.max(jnp.abs(pos)) * 1.1 + 10.0
