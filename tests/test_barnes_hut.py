"""Barnes-Hut vs the all-pairs oracle.

Reference-informed acceptance (SURVEY.md §4): BH error -> 0 as theta -> 0;
at the production theta=0.8 the group-conservative criterion is at least as
accurate as the reference's per-body criterion, so errors stay small.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu.ops.allpairs import allpairs_accel_reference
from spatialsim_tpu.ops.barnes_hut import barnes_hut_accel, barnes_hut_accel_impl
from spatialsim_tpu import distributions


def _galaxy(n, seed=0):
    p, v, m = distributions.generate_distribution("galaxy", n, 200.0, 0.1,
                                                  seed=seed)
    return (jnp.asarray(p.T, jnp.float32), jnp.asarray(m, jnp.float32))


def _rel_err(approx, exact):
    num = np.linalg.norm(np.asarray(approx - exact), axis=0)
    den = np.linalg.norm(np.asarray(exact), axis=0) + 1e-12
    return num / den


def test_bh_matches_allpairs_small_theta():
    pos, mass = _galaxy(2000)
    exact = allpairs_accel_reference(pos, mass, 0.1, 2.0)
    approx = barnes_hut_accel_impl(pos, mass, theta=0.05, G=0.1,
                                   softening=2.0, max_depth=8,
                                   group_size=64, frontier_cap=1024,
                                   near_ranges=512, leaf_size=16)
    err = _rel_err(approx, exact)
    assert np.median(err) < 1e-4
    assert np.percentile(err, 99) < 1e-2


def test_bh_production_theta_accuracy():
    pos, mass = _galaxy(4000, seed=3)
    exact = allpairs_accel_reference(pos, mass, 0.1, 2.0)
    approx = barnes_hut_accel_impl(pos, mass, theta=0.8, G=0.1,
                                   softening=2.0, max_depth=9,
                                   group_size=64, frontier_cap=1024,
                                   near_ranges=256, leaf_size=8)
    err = _rel_err(approx, exact)
    # Conservative group criterion => tighter than per-body theta=0.8.
    assert np.median(err) < 5e-3
    assert np.percentile(err, 99) < 5e-2


def test_bh_error_decreases_with_theta():
    pos, mass = _galaxy(1500, seed=7)
    exact = allpairs_accel_reference(pos, mass, 0.1, 2.0)
    errs = []
    for theta in (1.2, 0.6, 0.2):
        approx = barnes_hut_accel_impl(pos, mass, theta=theta, G=0.1,
                                       softening=2.0, max_depth=6,
                                       group_size=64, frontier_cap=512,
                                       near_ranges=512, leaf_size=8)
        errs.append(float(np.median(_rel_err(approx, exact))))
    assert errs[0] >= errs[1] >= errs[2]


def test_bh_uniform_cube_and_cluster_distributions(rng):
    # Clustered (Plummer) exercises deep descent + near-field capacity.
    for name in ("cluster", "cube"):
        p, v, m = distributions.generate_distribution(name, 3000, 150.0, 0.1,
                                                      seed=11)
        pos = jnp.asarray(p.T, jnp.float32)
        mass = jnp.asarray(m, jnp.float32)
        exact = allpairs_accel_reference(pos, mass, 0.1, 2.0)
        approx = barnes_hut_accel_impl(pos, mass, theta=0.5, G=0.1,
                                       softening=2.0, max_depth=7,
                                       group_size=64, frontier_cap=512,
                                       near_ranges=512, leaf_size=8)
        err = _rel_err(approx, exact)
        assert np.median(err) < 2e-2, name


def test_bh_config_wrapper_runs():
    cfg = NBodyConfig(num_bodies=512, theta=0.8, G=0.1, softening=2.0,
                      max_depth=6, group_size=64, frontier_capacity=512,
                      near_capacity=1024, leaf_size=8)
    pos, mass = _galaxy(512)
    acc = barnes_hut_accel(pos, mass, cfg)
    assert acc.shape == (3, 512)
    assert np.all(np.isfinite(np.asarray(acc)))


def test_bh_zero_mass_padding_bodies_are_inert():
    # Padding is exercised whenever n is not a multiple of group_size.
    pos, mass = _galaxy(1000)
    acc_a = barnes_hut_accel_impl(pos[:, :999], mass[:999], theta=0.3,
                                  G=0.1, softening=2.0, max_depth=6,
                                  group_size=64, frontier_cap=512,
                                  near_ranges=512, leaf_size=8)
    exact = allpairs_accel_reference(pos[:, :999], mass[:999], 0.1, 2.0)
    assert np.median(_rel_err(acc_a, exact)) < 1e-2
