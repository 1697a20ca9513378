"""Boids flocking kernels vs a float64 numpy transliteration of the
reference's Numba semantics (boids/flock.py:68-308)."""

import numpy as np
import jax.numpy as jnp

from spatialsim_tpu.config.boids import BoidsConfig
from spatialsim_tpu.ops.boids_ops import flocking_forces, boids_physics
from spatialsim_tpu.models.boids import Flock


def numpy_flocking_full(pos, vel, col, cfg):
    """O(N^2) float64 transliteration of compute_flocking_spatial — the grid
    in the reference only accelerates the scan; since cell_size equals the
    perception radius, the 27-cell neighbourhood covers the full perception
    sphere and brute force gives identical results."""
    n = pos.shape[0]
    forces = np.zeros((n, 3))
    avg_colors = col.copy()
    psq = cfg.perception_radius ** 2
    ssq = cfg.separation_radius ** 2
    for i in range(n):
        d = pos[i] - pos
        dist_sq = np.sum(d * d, axis=1)
        nb = (dist_sq < psq) & (dist_sq > 0.0001)
        sepm = nb & (dist_sq < ssq)
        f = np.zeros(3)
        if sepm.any():
            dist = np.sqrt(dist_sq[sepm])
            sep = np.sum(d[sepm] / dist[:, None] ** 2, axis=0) / sepm.sum()
            mag = np.linalg.norm(sep)
            if mag > 0:
                s = sep / mag * cfg.max_speed - vel[i]
                smag = np.linalg.norm(s)
                if smag > cfg.max_force:
                    s *= cfg.max_force / smag
                f += s * cfg.separation_weight
        if nb.any():
            cnt = nb.sum()
            align = vel[nb].mean(axis=0)
            mag = np.linalg.norm(align)
            if mag > 0:
                s = align / mag * cfg.max_speed - vel[i]
                smag = np.linalg.norm(s)
                if smag > cfg.max_force:
                    s *= cfg.max_force / smag
                f += s * cfg.alignment_weight
            coh = pos[nb].mean(axis=0) - pos[i]
            mag = np.linalg.norm(coh)
            if mag > 0:
                s = coh / mag * cfg.max_speed - vel[i]
                smag = np.linalg.norm(s)
                if smag > cfg.max_force:
                    s *= cfg.max_force / smag
                f += s * cfg.cohesion_weight
            avg_colors[i] = (col[nb].sum(axis=0) + col[i]) / (cnt + 1)
        forces[i] = f
    return forces, avg_colors


def _run_tpu_flocking(pos, vel, col, cfg):
    import math
    cell_range = int(math.ceil(cfg.perception_radius / cfg.cell_size))
    force, avg = flocking_forces(
        jnp.asarray(pos.T, jnp.float32), jnp.asarray(vel.T, jnp.float32),
        jnp.asarray(col.T, jnp.float32),
        cell_size=cfg.cell_size, grid_dim=cfg.grid_dim,
        offset=cfg.bounds + cfg.cell_size,
        perception_radius=cfg.perception_radius,
        separation_radius=cfg.separation_radius,
        separation_weight=cfg.separation_weight,
        alignment_weight=cfg.alignment_weight,
        cohesion_weight=cfg.cohesion_weight,
        max_speed=cfg.max_speed, max_force=cfg.max_force,
        cell_range=cell_range, cell_capacity=cfg.cell_capacity,
        chunk=256)
    return np.asarray(force).T, np.asarray(avg).T


def test_flocking_matches_numpy(rng):
    cfg = BoidsConfig(num_boids=200, bounds=30.0, cell_capacity=64)
    n = cfg.num_boids
    pos = rng.uniform(-cfg.bounds, cfg.bounds, (n, 3))
    vel = rng.normal(0, 5, (n, 3))
    col = rng.uniform(0, 1, (n, 3))
    expect_f, expect_c = numpy_flocking_full(pos, vel, col, cfg)
    got_f, got_c = _run_tpu_flocking(pos, vel, col, cfg)
    np.testing.assert_allclose(got_f, expect_f, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_c, expect_c, rtol=1e-4, atol=1e-5)


def test_physics_update_walls_and_clamp(rng):
    cfg = BoidsConfig()
    n = 64
    pos = rng.uniform(-cfg.bounds, cfg.bounds, (3, n)).astype(np.float32)
    # Put some boids inside the wall margin.
    pos[0, :8] = cfg.bounds - 0.5
    pos[1, 8:16] = -cfg.bounds + 0.5
    vel = rng.normal(0, 40, (3, n)).astype(np.float32)
    col = rng.uniform(0, 1, (3, n)).astype(np.float32)
    force = np.zeros((3, n), np.float32)
    avg = col.copy()
    dt = 0.02
    wall_force = cfg.max_force * cfg.wall_weight
    p2, v2, c2 = boids_physics(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(col),
        jnp.asarray(force), jnp.asarray(avg),
        bounds=cfg.bounds, margin=cfg.wall_margin, wall_force=wall_force,
        max_speed=cfg.max_speed, color_blend=0.5, dt=dt)
    v2 = np.asarray(v2)
    # Speed clamp respected.
    speeds = np.linalg.norm(v2, axis=0)
    assert (speeds <= cfg.max_speed * 1.0001).all()
    # Wall spring pushes back: boid deep in +x margin gets -x acceleration.
    pen = pos[0, 0] - (cfg.bounds - cfg.wall_margin)
    strength = min(pen / cfg.wall_margin * 2.0, 1.0)
    vx_expect = vel[0, 0] - strength * wall_force * dt
    vx_expect *= min(1.0, cfg.max_speed / abs(np.linalg.norm(
        [vx_expect, vel[1, 0], vel[2, 0]])))
    # Direction check only (clamping makes exact check fiddly).
    assert v2[0, 0] < vel[0, 0]


def test_flock_end_to_end_runs():
    flock = Flock(num_boids=500, config=BoidsConfig(
        num_boids=500, bounds=50.0, cell_capacity=32))
    for _ in range(3):
        flock.update(0.016)
    pos = flock.get_positions()
    assert pos.shape == (500, 3)
    assert np.isfinite(pos).all()
    col = flock.get_colors()
    assert ((col >= 0) & (col <= 1.0001)).all()
