"""Multi-chip-without-a-pod: 8 virtual CPU devices (SURVEY.md §4).

Property under test: the sharded program equals the unsharded one —
the TPU analogue of multi-node determinism testing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialsim_tpu import distributions
from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu.models.nbody import NBodyState, make_step_fn
from spatialsim_tpu.ops.allpairs import allpairs_accel_reference
from spatialsim_tpu.parallel import (
    make_mesh, make_sharded_step, ring_allpairs_accel,
    sharded_barnes_hut_accel, shard_state)


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    # jax's persistent-cache serializer segfaults writing this module's
    # big shard_map executables late in a full-suite process (observed
    # deterministically at jax/_src/compilation_cache.py:
    # put_executable_and_time; config flags did not gate the write in
    # this jax build).  Stub the write out — reads stay enabled.
    from jax._src import compilation_cache as cc
    mp = pytest.MonkeyPatch()
    mp.setattr(cc, "put_executable_and_time", lambda *a, **k: None)
    yield
    mp.undo()


def _state(n, seed=0, dist="galaxy"):
    p, v, m = distributions.generate_distribution(dist, n, 200.0, 0.1,
                                                  seed=seed)
    return NBodyState(jnp.asarray(p.T, jnp.float32),
                      jnp.asarray(v.T, jnp.float32),
                      jnp.asarray(m, jnp.float32))


@requires_8
def test_ring_allpairs_matches_reference():
    st = _state(1024)
    mesh = make_mesh(8)
    acc = ring_allpairs_accel(st.pos, st.mass, mesh, 0.1, 2.0)
    exact = allpairs_accel_reference(st.pos, st.mass, 0.1, 2.0)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(exact),
                               rtol=2e-4, atol=2e-5)


@requires_8
@pytest.mark.slow
def test_sharded_bh_matches_single_chip():
    cfg = NBodyConfig(theta=0.7, G=0.1, softening=2.0, max_depth=7,
                      group_size=64, frontier_capacity=512,
                      near_capacity=2048, leaf_size=8)
    st = _state(2048, seed=2)
    mesh = make_mesh(8)
    from spatialsim_tpu.ops.barnes_hut import barnes_hut_accel
    single = barnes_hut_accel(st.pos, st.mass, cfg)
    sharded = sharded_barnes_hut_accel(st.pos, st.mass, mesh, cfg)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=2e-4, atol=1e-5)


@requires_8
@pytest.mark.parametrize("engine", ["allpairs", "barnes_hut"])
def test_sharded_step_equals_unsharded(engine):
    cfg = NBodyConfig(theta=0.8, G=0.1, softening=2.0, damping=1.0,
                      max_depth=7, group_size=64, frontier_capacity=512,
                      near_capacity=2048, leaf_size=8,
                      allpairs_threshold=100_000 if engine == "allpairs"
                      else 0)
    n = 1024
    mesh = make_mesh(8)
    st = _state(n, seed=4)

    unsharded = make_step_fn(
        cfg, n, substeps=2,
        engine="allpairs" if engine == "allpairs" else "exact")
    ref = unsharded(jax.tree_util.tree_map(jnp.copy, st), jnp.float32(0.05))

    sstep = make_sharded_step(cfg, n, mesh, substeps=2, engine=engine)
    out = sstep(shard_state(st, mesh), jnp.float32(0.05))

    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=2e-4, atol=2e-4)


@requires_8
def test_sharded_step_preserves_sharding():
    cfg = NBodyConfig(allpairs_threshold=10_000)
    mesh = make_mesh(8)
    st = shard_state(_state(1024), mesh)
    sstep = make_sharded_step(cfg, 1024, mesh, substeps=1)
    out = sstep(st, jnp.float32(0.01))
    assert out.pos.sharding.spec == jax.sharding.PartitionSpec(None, "bodies")


@requires_8
@pytest.mark.parametrize("drift_mode", ["off", "max"])
@pytest.mark.slow
def test_sharded_window_engine_matches_single_chip(drift_mode):
    from spatialsim_tpu.ops.bh_window import (
        init_window_state, make_window_step)
    from spatialsim_tpu.parallel.sharded import make_sharded_window_step

    n = 1024
    # drift_mode="max" exercises the pmax Verlet-skin rebuild trigger in
    # the sharded step (a tight skin forces drift rebuilds); both sides
    # see the same global drift, so they rebuild on the same steps.
    cfg = NBodyConfig(num_bodies=n, theta=0.8, G=0.1, softening=2.0,
                      max_depth=7, group_size=64, list_capacity=512,
                      window_groups=2,
                      skin=4.0 if drift_mode == "off" else 0.5,
                      rebuild_interval=3,
                      rebuild_drift_mode=drift_mode)
    st = _state(n, seed=4)

    sstep_fn, init_fn = make_sharded_window_step(cfg, n, make_mesh(8),
                                                 substeps=2)
    sh_state = init_fn(jnp.copy(st.pos), jnp.copy(st.vel), jnp.copy(st.mass))

    ustep = make_window_step(cfg, n, substeps=2)
    ustate = init_window_state(jnp.copy(st.pos), jnp.copy(st.vel),
                               jnp.copy(st.mass), cfg)

    dt = jnp.float32(0.02)
    for _ in range(3):   # crosses a rebuild (interval 3, 2 substeps/call)
        sh_state = sstep_fn(sh_state, dt)
        ustate = ustep(ustate, dt)

    np.testing.assert_allclose(np.asarray(sh_state.pos),
                               np.asarray(ustate.pos), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sh_state.vel),
                               np.asarray(ustate.vel), rtol=2e-4, atol=2e-4)


@requires_8
@pytest.mark.slow
def test_sharded_window_replicated_fallback_matches_single_chip(monkeypatch):
    """The sample-sort OVERFLOW fallback (replicated argsort branch of
    the sharded rebuild) produces the same trajectory as the unsharded
    step — forced by a cap_factor that overflows every bin."""
    import functools
    from spatialsim_tpu.ops.bh_window import (
        init_window_state, make_window_step)
    from spatialsim_tpu.parallel import distsort
    from spatialsim_tpu.parallel.sharded import make_sharded_window_step

    orig = distsort.sample_sort_local
    monkeypatch.setattr(
        distsort, "sample_sort_local",
        functools.partial(orig, cap_factor=1e-9))

    n = 1024
    cfg = NBodyConfig(num_bodies=n, theta=0.8, G=0.1, softening=2.0,
                      max_depth=7, group_size=64, list_capacity=512,
                      window_groups=2, skin=4.0, rebuild_interval=3,
                      rebuild_drift_mode="off")
    st = _state(n, seed=4)

    sstep_fn, init_fn = make_sharded_window_step(cfg, n, make_mesh(8),
                                                 substeps=2)
    sh_state = init_fn(jnp.copy(st.pos), jnp.copy(st.vel),
                       jnp.copy(st.mass))
    ustep = make_window_step(cfg, n, substeps=2)
    ustate = init_window_state(jnp.copy(st.pos), jnp.copy(st.vel),
                               jnp.copy(st.mass), cfg)
    dt = jnp.float32(0.02)
    for _ in range(3):   # crosses a rebuild -> exercises the fallback
        sh_state = sstep_fn(sh_state, dt)
        ustate = ustep(ustate, dt)
    np.testing.assert_allclose(np.asarray(sh_state.pos),
                               np.asarray(ustate.pos), rtol=2e-4,
                               atol=2e-4)


@requires_8
@pytest.mark.parametrize("second_pass", [True, False])
def test_sharded_boids_matches_single_chip(second_pass):
    """Sharded boids window engine (pass-1 halo exchange + pass-2
    all_gather + replicated resort) tracks the single-chip frozen-order
    stepper through a re-sort (VERDICT r4 #7)."""
    from spatialsim_tpu.config.boids import BoidsConfig
    from spatialsim_tpu.models.boids import Flock, make_step_fn
    from spatialsim_tpu.parallel.sharded import make_sharded_boids_step

    n = 4096
    cfg = BoidsConfig(num_boids=n, neighbor_mode="window", group_size=64,
                      window_groups=2, pass2_window_groups=1,
                      second_pass=second_pass, resort_interval=3)
    flock = Flock(config=cfg, seed=7)
    ustep = make_step_fn(cfg, substeps=2)
    ustate = jax.tree_util.tree_map(jnp.copy, flock.state)

    sstep, init_fn = make_sharded_boids_step(cfg, n, make_mesh(8),
                                             substeps=2)
    # Rebuild the ORIGINAL-order arrays for the sharded init.
    inv = flock.state.inv1
    sh_state = init_fn(flock.state.pos[:, inv], flock.state.vel[:, inv],
                       flock.state.col[:, inv])

    dt = jnp.float32(1.0 / 30.0)
    for _ in range(3):   # 6 substeps: crosses the interval-3 re-sort
        sh_state = sstep(sh_state, dt)
        ustate = ustep(ustate, dt)

    # Compare in ORIGINAL boid order (each side's sort maps differ only
    # by composition, the trajectories must agree).
    for fld in ("pos", "vel", "col"):
        a = np.asarray(getattr(sh_state, fld)[:, sh_state.inv1])
        b = np.asarray(getattr(ustate, fld)[:, ustate.inv1])
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4,
                                   err_msg=fld)


@requires_8
@pytest.mark.slow
def test_sharded_window_refresh_matches_single_chip():
    """refresh_interval in the sharded engine (all_gather + device-local
    _refresh_dense_core over the shard's entries) tracks the single-chip
    trajectory through refreshes AND the following rebuild — closing
    round 3's sharded staleness gap (VERDICT r3 weak #4)."""
    from spatialsim_tpu.ops.bh_window import (
        init_window_state, make_window_step)
    from spatialsim_tpu.parallel.sharded import make_sharded_window_step

    n = 1024
    cfg = NBodyConfig(num_bodies=n, theta=0.8, G=0.1, softening=2.0,
                      max_depth=7, group_size=64, list_capacity=512,
                      window_groups=2, skin=4.0, rebuild_interval=6,
                      refresh_interval=2, rebuild_drift_mode="off")
    st = _state(n, seed=11)

    sstep_fn, init_fn = make_sharded_window_step(cfg, n, make_mesh(8),
                                                 substeps=2)
    sh_state = init_fn(jnp.copy(st.pos), jnp.copy(st.vel),
                       jnp.copy(st.mass))
    ustep = make_window_step(cfg, n, substeps=2)
    ustate = init_window_state(jnp.copy(st.pos), jnp.copy(st.vel),
                               jnp.copy(st.mass), cfg)

    dt = jnp.float32(0.02)
    for _ in range(4):   # 8 substeps: refreshes at 2 and 4, rebuild at 6
        sh_state = sstep_fn(sh_state, dt)
        ustate = ustep(ustate, dt)

    np.testing.assert_allclose(np.asarray(sh_state.pos),
                               np.asarray(ustate.pos), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(sh_state.vel),
                               np.asarray(ustate.vel), rtol=2e-4,
                               atol=2e-4)
