"""Distribution generator statistics (SURVEY.md §4 unit plan)."""

import numpy as np
import pytest

from spatialsim_tpu.distributions import (
    generate_distribution, compute_rotation_curve, DISTRIBUTIONS)

@pytest.mark.parametrize("name", DISTRIBUTIONS)
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


# --- structural checks on the extended generators (reference
# tools/presets.py:399-1390 recipes) ---

def test_binary_two_tilted_disks():
    n = 8000
    pos, vel, mass = generate_distribution("binary", n, 500.0, 0.1, seed=5)
    half = n // 2
    assert pos[:half, 0].mean() < -100 and pos[half:, 0].mean() > 100
    # Disk 2 is tilted 30 deg: its out-of-plane spread is larger.
    assert np.std(pos[half:, 1]) > 3 * np.std(pos[:half, 1])


def test_explosion_is_radially_expanding():
    pos, vel, mass = generate_distribution("explosion", 5000, 500.0, 0.1,
                                           seed=5)
    r = np.linalg.norm(pos, axis=1) + 1e-9
    radial = np.sum(pos * vel, axis=1) / r
    assert (radial > 0).mean() > 0.99
    # Heavy remnant core (mass 2.0) vs light ejecta (0.5).
    assert set(np.round(np.unique(mass), 3)) == {0.5, 2.0}


def test_filament_mass_and_voids():
    pos, vel, mass = generate_distribution("filament", 20000, 500.0, 0.1,
                                           seed=9)
    np.testing.assert_allclose(mass, 0.1)
    # Hubble-flow: velocity correlates with position.
    corr = np.corrcoef(pos.ravel(), vel.ravel())[0, 1]
    assert corr > 0.5


def test_accretion_disk_structure():
    n = 10000
    pos, vel, mass = generate_distribution("accretion_disk", n, 500.0, 0.1,
                                           seed=4)
    # ~1% massive BH particles of mass 200.
    assert np.sum(mass == 200.0) == max(1, n // 100)
    # Jets: some particles with |y| > 0.9R moving vertically.
    jets = np.abs(pos[:, 1]) > 450
    assert jets.sum() > 0
    assert np.all(np.abs(vel[jets, 1]) == 3.0)


def test_torus_hole_in_middle():
    pos, vel, mass = generate_distribution("torus", 5000, 500.0, 0.1, seed=2)
    r_xz = np.linalg.norm(pos[:, [0, 2]], axis=1)
    # Major radius 0.6R, minor 0.25R: nothing near the axis.
    assert r_xz.min() > 50.0


def test_dyson_shell_radius_and_central_star():
    n = 4000
    pos, vel, mass = generate_distribution("dyson", n, 500.0, 0.1, seed=8)
    cn = max(1, n // 200)
    assert np.all(mass[:cn] == 500.0)
    r = np.linalg.norm(pos[cn:], axis=1)
    np.testing.assert_allclose(r.mean(), 0.7 * 500.0, rtol=0.05)
    # Shell velocity is tangential: v . r ~ 0.
    dots = np.abs(np.sum(pos[cn:] * vel[cn:], axis=1)) / (
        r * np.linalg.norm(vel[cn:], axis=1) + 1e-9)
    assert np.median(dots) < 0.1


def test_double_helix_two_strands():
    pos, vel, mass = generate_distribution("double_helix", 2000, 500.0, 0.1,
                                           seed=1)
    r_xz = np.linalg.norm(pos[:, [0, 2]], axis=1)
    # Tight tube radius 0.25R with small noise.
    np.testing.assert_allclose(r_xz.mean(), 0.25 * 500.0, rtol=0.1)
    # Tall: pitch 2R.
    assert pos[:, 1].max() - pos[:, 1].min() > 500.0


def test_triple_three_clusters():
    n = 9000
    pos, vel, mass = generate_distribution("triple", n, 500.0, 0.1, seed=6)
    third = n // 3
    sep = 500.0 * 0.8
    for g, ang in enumerate([0, 2 * np.pi / 3, 4 * np.pi / 3]):
        c = pos[g * third:(g + 1) * third].mean(axis=0)
        expected = np.array([sep * np.cos(ang), 0, sep * np.sin(ang)])
        assert np.linalg.norm(c - expected) < 100.0


def test_hourglass_cones_and_binary():
    n = 8000
    pos, vel, mass = generate_distribution("hourglass", n, 500.0, 0.1, seed=3)
    bn = max(2, n // 200)
    assert np.all(mass[:bn] == 100.0)
    neb = pos[bn:]
    # Cone: radius grows with |y| (r ~ |y|/2).
    r_xz = np.linalg.norm(neb[:, [0, 2]], axis=1)
    corr = np.corrcoef(np.abs(neb[:, 1]), r_xz)[0, 1]
    assert corr > 0.8


def test_vortex_funnel_rotates():
    pos, vel, mass = generate_distribution("vortex", 5000, 500.0, 0.1, seed=2)
    # Angular momentum about y is coherent.
    Ly = pos[:, 2] * vel[:, 0] - pos[:, 0] * vel[:, 2]
    assert np.abs(np.mean(np.sign(Ly))) > 0.9


def test_stream_drifts_along_x():
    pos, vel, mass = generate_distribution("stream", 3000, 500.0, 0.1, seed=1)
    assert vel[:, 0].mean() > 4.0
    assert pos[:, 0].max() - pos[:, 0].min() > 2 * 500.0


@pytest.mark.parametrize("name", ["bar", "elliptical", "vortex", "triple",
                                  "binary"])
def test_extended_zero_com_velocity(name):
    pos, vel, mass = generate_distribution(name, 4000, 500.0, 0.1, seed=3)
    com_v = np.sum(vel * mass[:, None], axis=0) / mass.sum()
    np.testing.assert_allclose(com_v, 0.0, atol=1e-9)
