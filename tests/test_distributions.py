"""Distribution generator statistics (SURVEY.md §4 unit plan)."""

import numpy as np
import pytest

from spatialsim_tpu.distributions import (
    generate_distribution, compute_rotation_curve, DISTRIBUTIONS)

IMPLEMENTED = ["galaxy", "collision", "spiral", "ring", "shell", "cluster",
               "cube", "sphere"]


@pytest.mark.parametrize("name", IMPLEMENTED)
def test_shapes_and_finiteness(name):
    n = 2000
    pos, vel, mass = generate_distribution(name, n, 500.0, 0.1, seed=7)
    assert pos.shape == (n, 3) and vel.shape == (n, 3) and mass.shape == (n,)
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
    assert (mass > 0).all()


@pytest.mark.parametrize("name", ["galaxy", "spiral", "cluster"])
def test_com_velocity_zeroed(name):
    # These generators explicitly zero the COM velocity
    # (reference presets.py:144-146 and analogues).
    pos, vel, mass = generate_distribution(name, 5000, 500.0, 0.1, seed=3)
    com_v = np.sum(vel * mass[:, None], axis=0) / mass.sum()
    np.testing.assert_allclose(com_v, 0.0, atol=1e-10)


def test_seed_determinism():
    a = generate_distribution("galaxy", 1000, 500.0, 0.1, seed=42)
    b = generate_distribution("galaxy", 1000, 500.0, 0.1, seed=42)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_galaxy_is_a_disk():
    pos, vel, mass = generate_distribution("galaxy", 20000, 500.0, 0.1, seed=1)
    # Thin in Y relative to XZ extent.
    assert np.std(pos[:, 1]) < 0.1 * np.std(pos[:, 0])
    # Rotating: specific angular momentum about Y axis is strongly nonzero.
    Ly = np.mean(pos[:, 2] * vel[:, 0] - pos[:, 0] * vel[:, 2])
    r_mean = np.mean(np.linalg.norm(pos[:, [0, 2]], axis=1))
    v_mean = np.mean(np.linalg.norm(vel[:, [0, 2]], axis=1))
    assert abs(Ly) > 0.3 * r_mean * v_mean


def test_collision_two_groups_approaching():
    n = 10000
    pos, vel, mass = generate_distribution("collision", n, 500.0, 0.1, seed=2)
    half = n // 2
    # Two spatially separated groups...
    assert pos[:half, 0].mean() < -100
    assert pos[half:, 0].mean() > 100
    # ...moving toward each other.
    assert vel[:half, 0].mean() > 0
    assert vel[half:, 0].mean() < 0


def test_cube_lattice():
    n = 27
    pos, vel, mass = generate_distribution("cube", n, 500.0, 0.1, seed=0)
    # 3x3x3 lattice with spacing 2R/side.
    xs = np.unique(np.round(pos[:, 0], 3))
    assert len(xs) == 3
    np.testing.assert_allclose(np.diff(xs), 2 * 500.0 / 3, rtol=1e-5)


def test_rotation_curve_monotone_inner_and_finite():
    r = np.linspace(0.01, 500, 1000)
    m = np.ones(1000)
    v = compute_rotation_curve(r, m, 0.1, 2.0)
    assert np.isfinite(v).all() and (v >= 0).all()
    # Rises from ~0 near the centre.
    assert v[0] < v[100]


def test_distribution_registry_has_25_names():
    assert len(DISTRIBUTIONS) == 25
