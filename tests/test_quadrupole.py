"""Quadrupole far-field moments: octree M2, force law, engine plumbing.

The reference is monopole-only (``nbody/simulation.py:232-274``); the
quadrupole far field is a TPU-native accuracy/perf feature of the window
engine (far entries carry the traceless second moment so coarser cells can
be accepted at equal force error — see ops/bh_window.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu.ops.allpairs import allpairs_accel_reference
from spatialsim_tpu.ops.bounds import compute_bounds
from spatialsim_tpu.ops.morton import morton_encode
from spatialsim_tpu.ops.octree import build_octree
from spatialsim_tpu.ops.bh_window import (
    _dense_accel, _dense_accel_quad, window_bh_accel)
from spatialsim_tpu import distributions


def _central_m2(pos, mass):
    com = (pos * mass).sum(1) / mass.sum()
    d = pos - com[:, None]
    return com, np.array([
        (mass * d[0] * d[0]).sum(), (mass * d[1] * d[1]).sum(),
        (mass * d[2] * d[2]).sum(), (mass * d[0] * d[1]).sum(),
        (mass * d[0] * d[2]).sum(), (mass * d[1] * d[2]).sum()])


def test_octree_central_second_moments(rng):
    n, depth = 4096, 5
    pos = jnp.asarray(rng.normal(0, 100, (3, n)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2, n), jnp.float32)
    half = compute_bounds(pos)
    codes = morton_encode(pos, half, depth)
    order = jnp.argsort(codes)
    tree = build_octree(codes[order], pos[:, order], mass[order], half,
                        max_depth=depth, start_level=2, n=n,
                        with_quadrupole=True)
    ncode = np.asarray(codes[order])
    npos = np.asarray(pos[:, order], np.float64)
    nmass = np.asarray(mass[order], np.float64)
    for li, lv in enumerate(tree.levels):
        shift = 3 * (depth - (tree.start_level + li))
        pcodes = ncode >> shift
        for ci in range(min(int(lv.n_cells), 16)):
            sel = pcodes == int(lv.code[ci])
            _, want = _central_m2(npos[:, sel], nmass[sel])
            got = np.asarray(lv.m2[:, ci], np.float64)
            np.testing.assert_allclose(
                got, want, atol=2e-4 * max(1.0, np.abs(want).max()))


def test_quadrupole_force_converges_faster_than_monopole(rng):
    # A compact mass cluster seen from distance d: monopole error is
    # O((s/d)^2) about the COM, the traceless quadrupole removes that
    # order leaving O((s/d)^3) — so the error ratio grows ~ d/s.
    m = 256
    cl_pos = rng.normal(0, 1.0, (3, m))
    cl_m = rng.uniform(0.5, 2.0, m)
    com, m2 = _central_m2(cl_pos, cl_m)
    tr = m2[:3].sum()
    q = np.array([3 * m2[0] - tr, 3 * m2[1] - tr, 3 * m2[2] - tr,
                  3 * m2[3], 3 * m2[4], 3 * m2[5]])
    for dist, min_ratio in ((5.0, 2.0), (15.0, 6.0)):
        tgt = rng.normal(size=(3, 32))
        tgt = tgt / np.linalg.norm(tgt, axis=0) * dist
        dd = cl_pos[:, None, :] - tgt[:, :, None]
        r2 = (dd ** 2).sum(0)
        w = cl_m[None, :] * r2 ** -1.5
        a_exact = (w[None] * dd).sum(2)
        gp = jnp.asarray(tgt[None], jnp.float32)
        sp = jnp.asarray(com[None, :, None], jnp.float32)
        sm = jnp.asarray([[cl_m.sum()]], jnp.float32)
        sq = jnp.asarray(q[None, :, None], jnp.float32)
        a_mono = np.asarray(_dense_accel(gp, sp, sm, 1.0, 1e-12))[0]
        a_quad = np.asarray(_dense_accel_quad(gp, sp, sm, sq, 1.0, 1e-12))[0]
        mag = np.linalg.norm(a_exact, axis=0)
        em = (np.linalg.norm(a_mono - a_exact, axis=0) / mag).mean()
        eq = (np.linalg.norm(a_quad - a_exact, axis=0) / mag).mean()
        assert eq < em / min_ratio, (dist, em, eq)


def _bodies(n, dist="galaxy", seed=3):
    p, v, m = distributions.generate_distribution(dist, n, 200.0, 0.1,
                                                  seed=seed)
    return (jnp.asarray(p.T, jnp.float32), jnp.asarray(v.T, jnp.float32),
            jnp.asarray(m, jnp.float32))


def _cfg(**kw):
    base = dict(theta=0.8, G=0.1, softening=2.0, max_depth=7, group_size=64,
                list_capacity=4096, window_groups=3, skin=4.0,
                use_quadrupole=True, quad_accept_scale=1.0)
    base.update(kw)
    return NBodyConfig(**base)


@pytest.mark.slow
def test_quad_window_beats_mono_median(rng):
    pos, vel, mass = _bodies(4000)
    exact = np.asarray(allpairs_accel_reference(pos, mass, 0.1, 2.0))
    mag = np.sqrt((np.linalg.norm(exact, axis=0) ** 2).mean())

    def med(cfg):
        a = np.asarray(window_bh_accel(pos, vel, mass, cfg,
                                       use_pallas=False))
        return np.median(np.linalg.norm(a - exact, axis=0) / mag)

    e_mono = med(_cfg(use_quadrupole=False))
    e_quad = med(_cfg())
    assert e_quad < e_mono * 0.55, (e_mono, e_quad)


@pytest.mark.slow
def test_quad_pallas_matches_xla_fallback():
    pos, vel, mass = _bodies(4000)
    cfg = _cfg(list_capacity=1024)
    a_x = window_bh_accel(pos, vel, mass, cfg, use_pallas=False)
    a_p = window_bh_accel(pos, vel, mass, cfg, use_pallas=True)
    scale = float(jnp.max(jnp.abs(a_x)))
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x),
                               atol=1e-4 * scale)
