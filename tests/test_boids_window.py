"""Window-mode boids vs the exact grid path."""

import jax.numpy as jnp
import numpy as np
import pytest

from spatialsim_tpu.config.boids import BoidsConfig
from spatialsim_tpu.models.boids import Flock, resolve_neighbor_mode
from spatialsim_tpu.ops.boids_ops import (flocking_forces,
                                          flocking_forces_window)


def _setup(n=4000, seed=0, bounds=None):
    rng = np.random.default_rng(seed)
    cfg = BoidsConfig(num_boids=n)
    if bounds is not None:
        cfg = cfg.replace(bounds=bounds)
    pos = jnp.asarray((rng.random((3, n)) - 0.5) * 2 * cfg.bounds, jnp.float32)
    vel = jnp.asarray((rng.random((3, n)) - 0.5) * cfg.max_speed, jnp.float32)
    col = jnp.asarray(rng.random((3, n)), jnp.float32)
    return cfg, pos, vel, col


def _common(cfg):
    return dict(cell_size=cfg.cell_size, grid_dim=cfg.grid_dim,
                offset=cfg.bounds + cfg.cell_size,
                perception_radius=cfg.perception_radius,
                separation_radius=cfg.separation_radius,
                separation_weight=cfg.separation_weight,
                alignment_weight=cfg.alignment_weight,
                cohesion_weight=cfg.cohesion_weight,
                max_speed=cfg.max_speed, max_force=cfg.max_force)


def test_window_mode_close_to_exact_grid():
    # Uniform boids at the default density: the two-pass Morton window
    # captures nearly every neighbour pair, so nearly every boid's force
    # must agree EXACTLY with the grid result (captured pairs use
    # identical math).
    cfg, pos, vel, col = _setup(6000)
    f_exact, c_exact = flocking_forces(pos, vel, col, cell_range=1,
                                       cell_capacity=32, **_common(cfg))
    f_win, c_win = flocking_forces_window(pos, vel, col, group_size=128,
                                          window_groups=3, **_common(cfg))
    fe = np.asarray(f_exact)
    fw = np.asarray(f_win)
    same = np.isclose(fe, fw, atol=1e-4).all(axis=0)
    assert same.mean() > 0.99
    assert abs(np.linalg.norm(fw) - np.linalg.norm(fe)) \
        < 0.05 * np.linalg.norm(fe) + 1e-6


def _exact_counts(pos, perception_radius):
    p = np.asarray(pos, np.float64)
    d2 = ((p[:, :, None] - p[:, None, :]) ** 2).sum(axis=0)
    return ((d2 > 0.0001) & (d2 < perception_radius ** 2)).sum(axis=1)


@pytest.mark.slow
def test_window_two_pass_capture_rate():
    """Pair capture >= 99.5% (VERDICT weak #5): count captured neighbour
    pairs against a brute-force O(N^2) oracle, and confirm no pair is
    double counted (captured <= exact per boid).

    bounds=60 is ~40x denser than the 500K-default uniform init (at
    production scale/grid the measured two-pass capture is 100%,
    scripts/boids_capture.py); bounds=30 below is a torture regime —
    the whole domain spans only 14 grid cells."""
    cfg, pos, vel, col = _setup(8000, seed=4, bounds=60)
    _, _, nb_win = flocking_forces_window(
        pos, vel, col, group_size=128, window_groups=3,
        return_counts=True, **_common(cfg))
    nb_exact = _exact_counts(pos, cfg.perception_radius)
    nb_win = np.asarray(nb_win)
    assert nb_exact.sum() > 15_000
    assert (nb_win <= nb_exact).all(), "double-counted pairs"
    capture = nb_win.sum() / max(nb_exact.sum(), 1)
    assert capture >= 0.995, f"capture rate {capture:.4f}"

    # The production default narrows PASS 2's window (seam pairs land in
    # its interior by construction of the diagonal shift); capture must
    # stay within a fraction of a percent of the full-width pass
    # (measured 0.9983 vs 0.9989 clustered at 100K,
    # scripts/boids_capture.py round 4).
    _, _, nb_narrow = flocking_forces_window(
        pos, vel, col, group_size=128, window_groups=3,
        pass2_window_groups=1, return_counts=True, **_common(cfg))
    nb_narrow = np.asarray(nb_narrow)
    assert (nb_narrow <= nb_exact).all(), "double-counted pairs"
    cap_narrow = nb_narrow.sum() / max(nb_exact.sum(), 1)
    assert cap_narrow >= 0.99, f"narrow pass-2 capture {cap_narrow:.4f}"


def test_window_two_pass_capture_torture():
    """Extreme density: 8000 boids across a 14-cell-wide grid."""
    cfg, pos, vel, col = _setup(8000, seed=3, bounds=30)
    _, _, nb_win = flocking_forces_window(
        pos, vel, col, group_size=128, window_groups=3,
        return_counts=True, **_common(cfg))
    nb_exact = _exact_counts(pos, cfg.perception_radius)
    nb_win = np.asarray(nb_win)
    assert nb_exact.sum() > 100_000
    assert (nb_win <= nb_exact).all(), "double-counted pairs"
    capture = nb_win.sum() / max(nb_exact.sum(), 1)
    assert capture >= 0.985, f"capture rate {capture:.4f}"


def test_window_single_pass_is_weaker():
    """The second pass is what closes the gap (regression guard for the
    dedup/merge logic actually doing something)."""
    cfg, pos, vel, col = _setup(8000, seed=3, bounds=30)
    _, _, nb_two = flocking_forces_window(
        pos, vel, col, group_size=128, window_groups=3,
        return_counts=True, **_common(cfg))
    _, _, nb_one = flocking_forces_window(
        pos, vel, col, group_size=128, window_groups=3, second_pass=False,
        return_counts=True, **_common(cfg))
    assert np.asarray(nb_one).sum() < np.asarray(nb_two).sum()


@pytest.mark.slow
def test_window_mode_dense_cluster_captures_neighbours():
    # All boids in one tight cluster: Morton-adjacent == spatially
    # adjacent, so the window must reproduce the grid forces closely.
    rng = np.random.default_rng(1)
    n = 2048
    cfg = BoidsConfig(num_boids=n)
    pos = jnp.asarray(rng.normal(size=(3, n)) * 3.0, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(3, n)) * 5.0, jnp.float32)
    col = jnp.asarray(rng.random((3, n)), jnp.float32)
    f_exact, _ = flocking_forces(pos, vel, col, cell_range=1,
                                 cell_capacity=2048, **_common(cfg))
    # Window sized to cover the whole cluster (ng=4 groups, wg=3 spans
    # every group from every group) -> captures every pair.
    f_win, _ = flocking_forces_window(pos, vel, col, group_size=512,
                                      window_groups=3, **_common(cfg))
    fe, fw = np.asarray(f_exact), np.asarray(f_win)
    rel = np.linalg.norm(fw - fe) / (np.linalg.norm(fe) + 1e-9)
    assert rel < 0.02


def test_mode_resolution_and_model():
    assert resolve_neighbor_mode(BoidsConfig(num_boids=1000)) == "grid"
    assert resolve_neighbor_mode(BoidsConfig(num_boids=100_000)) == "window"
    assert resolve_neighbor_mode(
        BoidsConfig(num_boids=100, neighbor_mode="window")) == "window"

    flock = Flock(config=BoidsConfig(num_boids=2048,
                                     neighbor_mode="window"))
    assert flock.neighbor_mode == "window"
    p0 = flock.get_positions()
    for _ in range(3):
        flock.update(0.016)
    p1 = flock.get_positions()
    assert not np.allclose(p0, p1)
    assert np.isfinite(p1).all()
    # Bounds respected (soft walls keep boids near the box).
    assert np.abs(p1).max() < flock.config.bounds * 1.2


def test_frozen_orders_match_stateless_when_fresh():
    # With freshly built orders the frozen-order production path and the
    # stateless two-pass path see the identical pair set.
    from spatialsim_tpu.models.boids import init_boids_window_state
    from spatialsim_tpu.ops.boids_ops import flocking_forces_window_frozen
    cfg = BoidsConfig(num_boids=4096, neighbor_mode="window",
                      group_size=128, window_groups=2)
    rng = np.random.default_rng(5)
    pos = jnp.asarray(((rng.random((3, 4096)) - 0.5)
                       * 2 * cfg.bounds), jnp.float32)
    vel = jnp.asarray((rng.random((3, 4096)) - 0.5) * 10, jnp.float32)
    col = jnp.asarray(rng.random((3, 4096)), jnp.float32)

    kw = dict(perception_radius=cfg.perception_radius,
              separation_radius=cfg.separation_radius,
              separation_weight=cfg.separation_weight,
              alignment_weight=cfg.alignment_weight,
              cohesion_weight=cfg.cohesion_weight,
              max_speed=cfg.max_speed, max_force=cfg.max_force)
    f_ref, c_ref = flocking_forces_window(
        pos, vel, col, cell_size=cfg.cell_size, grid_dim=cfg.grid_dim,
        offset=cfg.bounds + cfg.cell_size, group_size=128,
        window_groups=2, **kw)

    st = init_boids_window_state(pos, vel, col, cfg)
    f_s, c_s = flocking_forces_window_frozen(
        st.pos, st.vel, st.col, st.p21, st.s21, group_size=128,
        window_groups=2, **kw)
    np.testing.assert_allclose(np.asarray(f_s[:, st.inv1]),
                               np.asarray(f_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_s[:, st.inv1]),
                               np.asarray(c_ref), rtol=1e-5, atol=1e-5)


def test_frozen_orders_capture_survives_resort_interval():
    # Step the production (frozen-order) flock to the END of a re-sort
    # interval, then compare its captured-pair count against fresh
    # orders at the same positions: staleness must cost < 1%.
    from spatialsim_tpu.models.boids import (
        Flock, init_boids_window_state)
    from spatialsim_tpu.ops.boids_ops import (
        flocking_forces_window_frozen, build_boids_orders)
    cfg = BoidsConfig(num_boids=8192, neighbor_mode="window",
                      group_size=128, window_groups=2, resort_interval=6)
    flock = Flock(config=cfg, seed=2)
    for _ in range(6):               # ends just before the re-sort fires
        flock.update(1.0 / 60.0)
    st = flock.state
    assert int(st.steps_since) == 6

    kw = dict(perception_radius=cfg.perception_radius,
              separation_radius=cfg.separation_radius,
              separation_weight=cfg.separation_weight,
              alignment_weight=cfg.alignment_weight,
              cohesion_weight=cfg.cohesion_weight,
              max_speed=cfg.max_speed, max_force=cfg.max_force)
    # Exercise the PRODUCTION pass-2 width (config default 1, narrower
    # than the op default 0 = full window) — interval-end drift gives a
    # narrow pass-2 far less slack than a fresh sort, so the staleness
    # bar must hold at the shipped width, not the widest one.
    _, _, nb_stale = flocking_forces_window_frozen(
        st.pos, st.vel, st.col, st.p21, st.s21, group_size=128,
        window_groups=2, pass2_window_groups=cfg.pass2_window_groups,
        return_counts=True, **kw)
    fresh = init_boids_window_state(st.pos, st.vel, st.col, cfg)
    _, _, nb_fresh = flocking_forces_window_frozen(
        fresh.pos, fresh.vel, fresh.col, fresh.p21, fresh.s21,
        group_size=128, window_groups=2,
        pass2_window_groups=cfg.pass2_window_groups,
        return_counts=True, **kw)
    captured = float(jnp.sum(nb_stale)) / max(float(jnp.sum(nb_fresh)), 1.0)
    assert captured >= 0.99, captured


def test_window_accumulate_pallas_matches_xla():
    """The column-source Pallas accumulator (boids_window_kernel) equals
    the XLA oracle form, with and without the pass-2 dedup."""
    from spatialsim_tpu.ops.boids_ops import _window_accumulate
    rng = np.random.default_rng(11)
    n, gsz, wg = 1024, 64, 2
    pos = jnp.asarray((rng.random((3, n)) - 0.5) * 120, jnp.float32)
    vel = jnp.asarray((rng.random((3, n)) - 0.5) * 10, jnp.float32)
    col = jnp.asarray(rng.random((3, n)), jnp.float32)
    grp = jnp.asarray(rng.integers(0, n // gsz, n), jnp.float32)[None, :]
    kw = dict(gsz=gsz, wg=wg, perception_sq=jnp.float32(25.0 ** 2),
              separation_sq=jnp.float32(10.0 ** 2))
    for grpf, prev in ((None, None), (grp, 2)):
        ref = _window_accumulate(pos, vel, col, grpf, prev_wg=prev,
                                 use_pallas=False, **kw)
        pal = _window_accumulate(pos, vel, col, grpf, prev_wg=prev,
                                 use_pallas=True, **kw)
        for a, b in zip(ref, pal):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)
