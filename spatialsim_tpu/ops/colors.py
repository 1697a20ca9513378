"""Velocity heat-map colouring.

Reproduces the reference's 7-segment blue→white→red gradient exactly
(reference ``nbody/simulation.py:320-400``; the same table is re-implemented
in the Metal shader at ``nbody/metal/barnes_hut.metal:147-206`` and — with a
masking bug we do not replicate — in the MPS backend at
``nbody/gpu_backend.py:507-591``).

Band boundaries on t = clamp(speed / max_speed, 0, 1):
  [0, .15)   bright purple-blue → blue
  [.15,.30)  blue → light blue
  [.30,.45)  light blue → cyan        (s < 0.6 sub-band of the .30-.55 ramp)
  [.45,.55)  cyan → white             (s >= 0.6 sub-band)
  [.55,.90)  white (primary range)
  [.90,.95)  white → yellow
  [.95,.99)  yellow → orange
  [.99,1.0]  orange → red
"""

from __future__ import annotations

import jax.numpy as jnp


def colors_by_velocity(vel, max_speed):
    """Map velocities to RGB colours.

    Args:
      vel: ``(3, N)`` float32 velocities.
      max_speed: scalar — speed mapped to the top of the gradient
        (the recorder hardcodes 15.0; reference ``tools/record.py:826``).

    Returns:
      ``(3, N)`` float32 RGB in [0, 1].
    """
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=0))
    t = jnp.minimum(speed / max_speed, 1.0)

    # Per-band local parameters.
    s0 = t / 0.15
    s1 = (t - 0.15) / 0.15
    sa = (t - 0.30) / 0.25          # 0..1 over [0.30, 0.55)
    s2 = sa / 0.6                   # light blue → cyan sub-band
    s3 = (sa - 0.6) / 0.4           # cyan → white sub-band
    s4 = (t - 0.90) / 0.05
    s5 = (t - 0.95) / 0.04
    s6 = (t - 0.99) / 0.01

    conds = [
        t < 0.15,
        t < 0.30,
        t < 0.45,                   # sa < 0.6
        t < 0.55,
        t < 0.90,
        t < 0.95,
        t < 0.99,
    ]
    one = jnp.ones_like(t)
    r = jnp.select(conds, [0.4 - 0.2 * s0, 0.2 + 0.1 * s1, 0.3 - 0.1 * s2,
                           0.2 + 0.8 * s3, one, one, one], default=one)
    g = jnp.select(conds, [0.2 + 0.2 * s0, 0.4 + 0.1 * s1, 0.5 + 0.3 * s2,
                           0.8 + 0.2 * s3, one, 1.0 - 0.05 * s4,
                           0.95 - 0.45 * s5], default=0.5 - 0.5 * s6)
    b = jnp.select(conds, [0.8 + 0.1 * s0, 0.9 + 0.05 * s1, 0.95 + 0.05 * s2,
                           one, one, 1.0 - s4, jnp.zeros_like(t)],
                   default=jnp.zeros_like(t))
    return jnp.stack([r, g, b]).astype(jnp.float32)
