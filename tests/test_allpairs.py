"""All-pairs force kernel: Pallas vs XLA oracle vs numpy, plus physics
invariants (momentum conservation, two-body circular orbit)."""

import numpy as np
import jax.numpy as jnp

from spatialsim_tpu.ops.allpairs import allpairs_accel, allpairs_accel_reference
from spatialsim_tpu.ops.integrator import integrate


def numpy_allpairs(pos_n3, mass, G, softening):
    """Float64 direct transliteration of the reference force law
    (nbody/simulation.py:247-266 applied all-pairs)."""
    n = pos_n3.shape[0]
    acc = np.zeros((n, 3))
    soft_sq = softening * softening
    for i in range(n):
        d = pos_n3 - pos_n3[i]
        dist_sq = np.sum(d * d, axis=1) + soft_sq
        w = np.where(dist_sq > soft_sq, G * mass / dist_sq ** 1.5, 0.0)
        acc[i] = np.sum(w[:, None] * d, axis=0)
    return acc


def test_reference_oracle_matches_numpy(rng):
    n = 64
    pos = rng.normal(0, 100, (n, 3))
    mass = rng.uniform(0.5, 2.0, n)
    expect = numpy_allpairs(pos, mass, G=0.1, softening=2.0)
    got = allpairs_accel_reference(
        jnp.asarray(pos.T, jnp.float32), jnp.asarray(mass, jnp.float32),
        0.1, 2.0)
    np.testing.assert_allclose(np.asarray(got).T, expect, rtol=2e-4, atol=1e-6)


def test_pallas_matches_oracle(rng):
    n = 300  # deliberately not a multiple of the tile size
    pos = rng.normal(0, 50, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    p = jnp.asarray(pos.T)
    m = jnp.asarray(mass)
    oracle = allpairs_accel_reference(p, m, 0.1, 2.0)
    got = allpairs_accel(p, m, 0.1, 2.0, tile_i=128, tile_j=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=1e-4, atol=1e-5)


def test_self_interaction_excluded():
    # A single body feels no force; two coincident bodies feel none either
    # (the dist_sq > softening_sq guard, reference simulation.py:260).
    pos = jnp.zeros((3, 2), jnp.float32)
    mass = jnp.ones(2, jnp.float32)
    acc = allpairs_accel_reference(pos, mass, 1.0, 2.0)
    np.testing.assert_array_equal(np.asarray(acc), 0.0)


def test_momentum_conservation(rng):
    # Equal masses, damping=1.0 => total momentum is exactly conserved by
    # the pair-antisymmetric force law (reference integrator semantics).
    n = 128
    pos = jnp.asarray(rng.normal(0, 100, (3, n)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 5, (3, n)), jnp.float32)
    mass = jnp.ones(n, jnp.float32)
    p0 = np.asarray(jnp.sum(vel * mass, axis=1))
    for _ in range(20):
        acc = allpairs_accel_reference(pos, mass, 0.1, 2.0)
        pos, vel = integrate(pos, vel, acc, 0.02, 1.0)
    p1 = np.asarray(jnp.sum(vel * mass, axis=1))
    np.testing.assert_allclose(p1, p0, atol=5e-3)


def test_two_body_circular_orbit():
    # Two bodies of mass m at distance d with softening: the softened force
    # magnitude is G*m*d/(d^2+s^2)^1.5; circular speed about the barycentre
    # (radius d/2): v = sqrt(F * d / 2).
    G, soft, d, m = 1.0, 0.5, 10.0, 100.0
    F = G * m * d / (d * d + soft * soft) ** 1.5
    v = np.sqrt(F * d / 2)
    pos = jnp.asarray([[-d / 2, d / 2], [0, 0], [0, 0]], jnp.float32)
    vel = jnp.asarray([[0, 0], [v, -v], [0, 0]], jnp.float32)
    mass = jnp.full((2,), m, jnp.float32)
    period = 2 * np.pi * (d / 2) / v
    steps = 400
    dt = period / steps
    for _ in range(steps):
        acc = allpairs_accel_reference(pos, mass, G, soft)
        pos, vel = integrate(pos, vel, acc, dt, 1.0)
    # After one period the bodies should be back near their start.
    np.testing.assert_allclose(np.asarray(pos)[0], [-d / 2, d / 2],
                               atol=0.05 * d)
    np.testing.assert_allclose(np.asarray(pos)[1], [0, 0], atol=0.05 * d)
