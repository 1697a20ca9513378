"""Velocity colour gradient vs a float64 transliteration of the reference
(nbody/simulation.py:320-400)."""

import numpy as np
import jax.numpy as jnp

from spatialsim_tpu.ops.colors import colors_by_velocity


def reference_gradient(t):
    """Scalar transliteration of the reference's 7-segment gradient."""
    if t < 0.55:
        if t < 0.15:
            s = t / 0.15
            return (0.4 - 0.2 * s, 0.2 + 0.2 * s, 0.8 + 0.1 * s)
        elif t < 0.30:
            s = (t - 0.15) / 0.15
            return (0.2 + 0.1 * s, 0.4 + 0.1 * s, 0.9 + 0.05 * s)
        else:
            s = (t - 0.30) / 0.25
            if s < 0.6:
                s2 = s / 0.6
                return (0.3 - 0.1 * s2, 0.5 + 0.3 * s2, 0.95 + 0.05 * s2)
            else:
                s2 = (s - 0.6) / 0.4
                return (0.2 + 0.8 * s2, 0.8 + 0.2 * s2, 1.0)
    elif t < 0.90:
        return (1.0, 1.0, 1.0)
    elif t < 0.95:
        s = (t - 0.90) / 0.05
        return (1.0, 1.0 - 0.05 * s, 1.0 - s)
    elif t < 0.99:
        s = (t - 0.95) / 0.04
        return (1.0, 0.95 - 0.45 * s, 0.0)
    else:
        s = (t - 0.99) / 0.01
        return (1.0, 0.5 - 0.5 * s, 0.0)


def test_gradient_matches_reference():
    max_speed = 15.0
    # Sample every band densely including the boundaries.
    ts = np.concatenate([
        np.linspace(0, 1.2, 481),
        np.array([0.15, 0.30, 0.45, 0.55, 0.90, 0.95, 0.99, 1.0]) - 1e-6,
        np.array([0.15, 0.30, 0.45, 0.55, 0.90, 0.95, 0.99]) + 1e-6,
    ])
    speeds = ts * max_speed
    vel = jnp.stack([jnp.asarray(speeds, jnp.float32),
                     jnp.zeros_like(jnp.asarray(speeds, jnp.float32)),
                     jnp.zeros_like(jnp.asarray(speeds, jnp.float32))])
    got = np.asarray(colors_by_velocity(vel, max_speed)).T
    expect = np.array([reference_gradient(min(t, 1.0)) for t in ts])
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_color_range():
    vel = jnp.asarray(np.random.default_rng(0).normal(0, 10, (3, 1000)),
                      jnp.float32)
    c = np.asarray(colors_by_velocity(vel, 15.0))
    assert c.min() >= 0.0 and c.max() <= 1.0001
    assert c.dtype == np.float32
