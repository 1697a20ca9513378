"""Windowed (production) Barnes-Hut engine vs oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu.models.nbody import NBodyState, make_step_fn, resolve_engine
from spatialsim_tpu.ops.allpairs import allpairs_accel_reference
from spatialsim_tpu.ops.bh_window import (
    WindowBHState, build_lists, eval_accel, init_window_state,
    make_window_step, refresh_lists, state_original_order,
    window_bh_accel, _build_kw)
from spatialsim_tpu import distributions


def _cfg(**kw):
    base = dict(theta=0.8, G=0.1, softening=2.0, max_depth=9, group_size=64,
                frontier_capacity=1024, list_capacity=4096, window_groups=3,
                skin=4.0, rebuild_interval=8)
    base.update(kw)
    return NBodyConfig(**base)


def _bodies(n, dist="galaxy", seed=3):
    p, v, m = distributions.generate_distribution(dist, n, 200.0, 0.1,
                                                  seed=seed)
    return (jnp.asarray(p.T, jnp.float32), jnp.asarray(v.T, jnp.float32),
            jnp.asarray(m, jnp.float32))


def _err_over_rms(approx, exact):
    errv = np.linalg.norm(np.asarray(approx) - np.asarray(exact), axis=0)
    rms = np.sqrt((np.linalg.norm(np.asarray(exact), axis=0) ** 2).mean())
    return errv / rms


@pytest.mark.parametrize("dist", ["galaxy", "cluster"])
@pytest.mark.slow
def test_window_accel_not_worse_than_exact_engine(dist):
    # theta=0.8 BH has intrinsic percent-level error on dense disks; the
    # production engine must be no less accurate than the reference-parity
    # per-step engine at the same theta.
    from spatialsim_tpu.ops.barnes_hut import barnes_hut_accel_impl
    pos, vel, mass = _bodies(4000, dist)
    exact = allpairs_accel_reference(pos, mass, 0.1, 2.0)
    approx = window_bh_accel(pos, vel, mass, _cfg())
    err = _err_over_rms(approx, exact)
    ref_bh = barnes_hut_accel_impl(
        pos, mass, theta=0.8, G=0.1, softening=2.0, max_depth=9,
        group_size=64, frontier_cap=1024, near_ranges=512, leaf_size=8)
    err_ref = _err_over_rms(ref_bh, exact)
    assert np.percentile(err, 99) <= np.percentile(err_ref, 99) * 1.25
    assert np.percentile(err, 99) < 0.08


def test_window_tight_theta_accuracy():
    pos, vel, mass = _bodies(4000, "galaxy")
    exact = allpairs_accel_reference(pos, mass, 0.1, 2.0)
    err = _err_over_rms(window_bh_accel(pos, vel, mass, _cfg(theta=0.5)),
                        exact)
    assert np.percentile(err, 99) < 0.01


@pytest.mark.slow
def test_window_accuracy_improves_with_theta():
    pos, vel, mass = _bodies(3000)
    exact = allpairs_accel_reference(pos, mass, 0.1, 2.0)
    errs = [np.median(_err_over_rms(
        window_bh_accel(pos, vel, mass, _cfg(theta=t)), exact))
        for t in (1.2, 0.6, 0.3)]
    assert errs[0] >= errs[1] >= errs[2]


@pytest.mark.slow
def test_frozen_far_entries_advance_with_velocity():
    # A distant massive clump moving at constant velocity: the frozen
    # list's predicted force should track the clump's motion first-order.
    rng = np.random.default_rng(0)
    n = 2048
    pos = rng.normal(size=(3, n)).astype(np.float32) * 5.0
    pos[0, n // 2:] += 500.0          # distant clump
    vel = np.zeros((3, n), np.float32)
    vel[0, n // 2:] = -10.0           # clump approaches
    mass = np.ones(n, np.float32)
    cfg = _cfg(group_size=64, window_groups=1)
    lists = build_lists(jnp.asarray(pos), jnp.asarray(vel),
                        jnp.asarray(mass), **_build_kw(cfg))
    from spatialsim_tpu.ops.bh_window import eval_accel
    dt, steps = 0.1, 20
    moved = pos.copy()
    moved[0, n // 2:] += -10.0 * dt * steps
    lists_stale = lists._replace(steps_since=jnp.int32(steps))
    a_pred = eval_accel(lists_stale, jnp.asarray(moved), jnp.asarray(mass),
                        jnp.float32(dt), G=0.1, softening=2.0,
                        group_size=64, window_groups=1)
    a_true = allpairs_accel_reference(jnp.asarray(moved),
                                      jnp.asarray(mass), 0.1, 2.0)
    err = _err_over_rms(a_pred, a_true)
    assert np.percentile(err, 99) < 0.05


@pytest.mark.slow
def test_window_trajectory_matches_exact_engine():
    n = 2048
    pos, vel, mass = _bodies(n, seed=5)
    cfg = _cfg(rebuild_interval=4)
    dt = jnp.float32(0.02)

    wstep = make_window_step(cfg, n, substeps=1)
    wstate = init_window_state(pos, vel, mass, cfg)

    estep = make_step_fn(cfg.replace(engine="exact"), n, substeps=1)
    estate = NBodyState(jnp.copy(pos), jnp.copy(vel), jnp.copy(mass))

    for _ in range(12):
        wstate = wstep(wstate, dt)
        estate = estep(estate, dt)
    # Same physics up to the two engines' (both θ=0.8-level) approximation.
    wpos, _, _ = state_original_order(wstate)
    scale = float(jnp.std(estate.pos))
    diff = float(jnp.max(jnp.abs(wpos - estate.pos)))
    assert diff < 0.05 * scale


@pytest.mark.slow
def test_interval_only_staleness_stays_theta_level():
    # Production mode: no drift rebuilds, interval 20.  Over a full cycle
    # the trajectory must stay within ~theta-level error of the exact
    # per-step engine (frozen entries advance ballistically).
    n = 2048
    pos, vel, mass = _bodies(n, seed=9)
    cfg = _cfg(rebuild_interval=20, rebuild_drift_mode="off")
    wstep = make_window_step(cfg, n, substeps=1)
    wstate = init_window_state(pos, vel, mass, cfg)
    estep = make_step_fn(cfg.replace(engine="exact"), n, substeps=1)
    estate = NBodyState(jnp.copy(pos), jnp.copy(vel), jnp.copy(mass))
    dt = jnp.float32(0.02)
    for _ in range(40):
        wstate = wstep(wstate, dt)
        estate = estep(estate, dt)
    wpos, _, _ = state_original_order(wstate)
    scale = float(jnp.std(estate.pos))
    diff = float(jnp.max(jnp.abs(wpos - estate.pos)))
    assert diff < 0.08 * scale


@pytest.mark.slow
def test_rebuild_policy_triggers_on_interval():
    n = 1024
    pos, vel, mass = _bodies(n)
    cfg = _cfg(rebuild_interval=3, group_size=64)
    step = make_window_step(cfg, n, substeps=1)
    st = init_window_state(pos, vel, mass, cfg)
    seen = []
    for _ in range(7):
        st = step(st, jnp.float32(0.02))
        seen.append(int(st.lists.steps_since))
    # steps_since resets at the rebuild (interval 3): 1,2,3,1,2,3,1
    assert seen == [1, 2, 3, 1, 2, 3, 1]


def test_engine_resolution():
    assert resolve_engine(NBodyConfig(allpairs_threshold=100), 50) == "allpairs"
    assert resolve_engine(NBodyConfig(allpairs_threshold=100), 500) == "window"
    assert resolve_engine(NBodyConfig(engine="exact"), 10) == "exact"


@pytest.mark.slow
def test_model_uses_window_engine():
    from spatialsim_tpu.models.nbody import NBodySimulation
    cfg = _cfg(num_bodies=2048, allpairs_threshold=1024, distribution="galaxy")
    sim = NBodySimulation(config=cfg)
    assert sim.engine == "window"
    assert isinstance(sim.state, WindowBHState)
    p0 = sim.get_positions()
    sim.update(0.01)
    assert not np.allclose(p0, sim.get_positions())
    assert np.isfinite(sim.get_positions()).all()
    # Resume path keeps the engine.
    sim2 = NBodySimulation.from_state(sim.get_positions(),
                                      sim.get_velocities(),
                                      sim.get_masses(), config=cfg)
    assert sim2.engine == "window"
    sim2.update(0.01)


@pytest.mark.slow
def test_list_saturation_degrades_boundedly():
    # EXTREME-scale proxy (VERDICT weak #7): a Plummer core with a
    # list_capacity below its demand, saturating ~15% of groups — the
    # same regime as the real 10M cluster (3.4% of groups at cap 8192,
    # scripts/quad_scan.py).  Folded cells become a mass-conserving
    # residual monopole; the error must stay at the theta level.  (At
    # >30% saturation the single residual is too coarse — measured 10x
    # median blowup — which is why resolve_config schedules capacity up
    # with N rather than relying on the fold.)
    from spatialsim_tpu.ops.bh_window import build_diagnostics
    n = 8192
    pos, vel, mass = _bodies(n, "cluster", seed=7)
    exact = allpairs_accel_reference(pos, mass, 0.1, 2.0)
    roomy = _cfg(group_size=64, list_capacity=4096)
    tight = _cfg(group_size=64, list_capacity=1536)

    diag = build_diagnostics(pos, vel, mass, tight)
    assert diag["groups_at_cap"] >= 0.05 * diag["ng"], \
        "proxy must actually saturate"
    assert diag["residual_mass_frac"] > 0

    err_roomy = _err_over_rms(window_bh_accel(pos, vel, mass, roomy), exact)
    err_tight = _err_over_rms(window_bh_accel(pos, vel, mass, tight), exact)
    assert np.median(err_tight) < max(2 * np.median(err_roomy), 0.005)
    assert (np.percentile(err_tight, 99)
            < 1.5 * np.percentile(err_roomy, 99))


@pytest.mark.slow
def test_sorted_state_preserves_identity_across_rebuilds():
    # The state lives Morton-sorted and re-sorts at every rebuild; the
    # composed slot -> original-body mapping must stay exact.  With dt=0
    # nothing moves, so after several rebuilds the original-order view
    # must be bit-identical to the inputs (masses prove the permutation,
    # positions prove the gathers).
    n = 2048
    pos, vel, mass = _bodies(n, seed=11)
    mass = mass + jnp.arange(n, dtype=jnp.float32) * 1e-4   # unique tags
    cfg = _cfg(rebuild_interval=2, group_size=64)
    step = make_window_step(cfg, n, substeps=1)
    st = init_window_state(pos, vel, mass, cfg)
    for _ in range(5):                      # crosses two rebuilds
        st = step(st, jnp.float32(0.0))
    opos, ovel, omass = state_original_order(st)
    np.testing.assert_array_equal(np.asarray(omass), np.asarray(mass))
    np.testing.assert_array_equal(np.asarray(opos), np.asarray(pos))
    np.testing.assert_array_equal(np.asarray(ovel), np.asarray(vel))


@pytest.mark.slow
def test_second_order_far_advance_tracks_acceleration():
    # A distant clump with velocity AND constant acceleration: the
    # second-order advance (com + v*tau + a*tau^2/2, advance_order=2)
    # must track it; the ballistic advance is off by a*tau^2/2.
    rng = np.random.default_rng(2)
    n = 2048
    pos = rng.normal(size=(3, n)).astype(np.float32) * 5.0
    pos[0, n // 2:] += 500.0
    vel = np.zeros((3, n), np.float32)
    vel[0, n // 2:] = -10.0
    a_true = np.zeros((3, n), np.float32)
    a_true[0, n // 2:] = -4.0              # clump decelerating inward
    mass = np.ones(n, np.float32)
    cfg = _cfg(group_size=64, window_groups=1)
    dt, steps = 0.1, 20
    tau = dt * steps
    moved = pos.copy()
    moved[0, n // 2:] += -10.0 * tau - 0.5 * 4.0 * tau * tau

    from spatialsim_tpu.ops.bh_window import eval_accel
    kw = _build_kw(cfg)
    errs = {}
    for tag, acc_in in (("order2", jnp.asarray(a_true)), ("order1", None)):
        lists = build_lists(jnp.asarray(pos), jnp.asarray(vel),
                            jnp.asarray(mass), acc_in, **kw)
        stale = lists._replace(steps_since=jnp.int32(steps))
        a_pred = eval_accel(stale, jnp.asarray(moved), jnp.asarray(mass),
                            jnp.float32(dt), G=0.1, softening=2.0,
                            group_size=64, window_groups=1)
        a_ref = allpairs_accel_reference(jnp.asarray(moved),
                                         jnp.asarray(mass), 0.1, 2.0)
        errs[tag] = np.percentile(_err_over_rms(a_pred, a_ref), 99)
    # order2 sits at the config's theta floor (~0.04, same as the
    # velocity-only advance test); order1 is off by a*tau^2/2 = 8 units
    # (measured p99 ~1.1).
    assert errs["order2"] < 0.05
    assert errs["order2"] < errs["order1"] * 0.25, errs


@pytest.mark.slow
def test_ballistic_advance_order_still_steps():
    # advance_order=1 (no acceleration carry) must remain a working
    # configuration (regression: the stepper once stored the computed
    # accelerations into a None-acc state, breaking the scan carry).
    n = 1024
    pos, vel, mass = _bodies(n)
    cfg = _cfg(rebuild_interval=2, group_size=64, advance_order=1)
    step = make_window_step(cfg, n, substeps=3)
    st = init_window_state(pos, vel, mass, cfg)
    assert st.acc is None
    st = step(st, jnp.float32(0.02))
    assert np.isfinite(np.asarray(st.pos)).all()


@pytest.mark.slow
def test_host_scheduled_step_matches_in_graph(monkeypatch):
    # The EXTREME-scale two-program split (host-scheduled rebuild) must
    # match the in-graph policy exactly at substeps=1 (the rebuild check
    # runs before every step in both).
    import spatialsim_tpu.ops.bh_window as bw
    n = 2048
    pos, vel, mass = _bodies(n, seed=13)
    cfg = _cfg(rebuild_interval=3, group_size=64,
               rebuild_drift_mode="off")
    dt = jnp.float32(0.02)

    ref_step = make_window_step(cfg, n, substeps=1)
    ref = init_window_state(pos, vel, mass, cfg)

    monkeypatch.setattr(bw, "HOST_SCHEDULED_THRESHOLD", 0)
    host_step = bw.make_window_step(cfg, n, substeps=1)
    st = init_window_state(jnp.copy(pos), jnp.copy(vel), jnp.copy(mass),
                           cfg)
    for _ in range(8):                    # crosses two rebuilds
        ref = ref_step(ref, dt)
        st = host_step(st, dt)
    assert int(st.lists.steps_since) == int(ref.lists.steps_since)
    np.testing.assert_allclose(np.asarray(st.pos), np.asarray(ref.pos),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_near_groups_conserve_mass_and_improve_error():
    """Neighbour-group coverage (config.near_groups): every body is
    counted exactly once (window + near + far + residual mass == total
    per group), and the exact near field never worsens force error."""
    n = 4096
    pos, vel, mass = _bodies(n, seed=7)
    exact = np.asarray(allpairs_accel_reference(pos, mass, 0.1, 2.0))

    errs = {}
    for K in (0, 6):
        cfg = _cfg(max_depth=7, group_size=64, window_groups=2,
                   list_capacity=4096, skin=2.0, near_groups=K)
        # Dense layout: the assertions below inspect lists.far directly.
        lists = build_lists(pos, vel, mass,
                            **{**_build_kw(cfg), "pool_tile": 0})
        gsz = 64
        npad = lists.order.shape[0]
        ng = npad // gsz
        s_mass = np.asarray(mass[lists.order])
        gmass = s_mass.reshape(ng, gsz).sum(1)
        far = np.asarray(lists.far)
        far_n = np.asarray(lists.far_n)
        near = np.asarray(lists.near)
        total = float(mass.sum())
        k = np.arange(far.shape[2])[None, :]
        fmass = np.where(k < far_n[:, None], far[:, 6, :], 0.0).sum(1)
        for g in range(ng):
            wmass = gmass[max(0, g - 2):min(ng, g + 3)].sum()
            nmass = (gmass[[i for i in near[g] if i >= 0]].sum()
                     if K else 0.0)
            assert abs(wmass + nmass + fmass[g] - total) < 1e-2 * total, \
                (K, g)

        acc = window_bh_accel(pos, vel, mass, cfg)
        errs[K] = float(np.median(_err_over_rms(acc, exact)))
    # The exact near field replaces approximated far entries: median
    # error must not get worse (allow float noise).
    assert errs[6] <= errs[0] * 1.05 + 1e-5, errs


def test_near_groups_pallas_matches_xla():
    n = 4096
    pos, vel, mass = _bodies(n, seed=9)
    cfg = _cfg(max_depth=7, group_size=64, window_groups=2,
               list_capacity=4096, skin=2.0, near_groups=6)
    a_x = np.asarray(window_bh_accel(pos, vel, mass, cfg, use_pallas=False))
    a_p = np.asarray(window_bh_accel(pos, vel, mass, cfg, use_pallas=True))
    np.testing.assert_allclose(a_p, a_x, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_near_groups_stepper_runs():
    n = 2048
    pos, vel, mass = _bodies(n, seed=11)
    cfg = _cfg(max_depth=7, group_size=64, window_groups=2,
               list_capacity=2048, skin=2.0, near_groups=4,
               rebuild_interval=3, rebuild_drift_mode="off")
    st = init_window_state(pos, vel, mass, cfg)
    step = make_window_step(cfg, n, substeps=2)
    for _ in range(3):      # crosses a rebuild
        st = step(st, jnp.float32(0.02))
    assert np.isfinite(np.asarray(st.pos)).all()
    assert st.lists.near.shape == (n // 64, 4)


@pytest.mark.slow
def test_refresh_rematerializes_exact_moments():
    """refresh_lists: after drift, every ranged entry's monopole equals a
    direct segment recompute over the current sorted state."""
    from spatialsim_tpu.ops.bh_window import build_lists, refresh_lists
    n = 2048
    pos, vel, mass = _bodies(n, seed=21)
    cfg = _cfg(max_depth=7, group_size=64, window_groups=2,
               list_capacity=2048, skin=2.0)
    # Dense layout: the oracle below reads far/far_range directly.
    lists = build_lists(pos, vel, mass,
                        **{**_build_kw(cfg), "pool_tile": 0})
    s_pos = pos[:, lists.order][:, :n]
    s_vel = vel[:, lists.order][:, :n]
    s_mass = mass[lists.order][:n]
    moved = s_pos + 0.3 * s_vel          # drifted state, same sort
    nl = refresh_lists(lists, moved, s_vel, s_mass)
    fr = np.asarray(lists.far_range)
    far = np.asarray(nl.far)
    fn = np.asarray(nl.far_n)
    sp = np.asarray(moved)
    sm = np.asarray(s_mass)
    rng = np.random.default_rng(0)
    for _ in range(50):
        g = int(rng.integers(0, far.shape[0]))
        if fn[g] == 0:
            continue
        slot = int(rng.integers(0, fn[g]))
        s0, e0 = fr[g, 0, slot], fr[g, 1, slot]
        if e0 <= s0:
            continue
        seg_m = sm[s0:e0].sum()
        if seg_m <= 0:
            continue
        com = (sp[:, s0:e0] * sm[s0:e0]).sum(1) / seg_m
        np.testing.assert_allclose(far[g, 0:3, slot], com, atol=5e-3)
        np.testing.assert_allclose(far[g, 6, slot], seg_m, rtol=1e-5)
    assert int(nl.steps_since) == 0


@pytest.mark.slow
def test_refresh_beats_frozen_advance():
    """Aged lists WITH periodic refresh track the oracle better than the
    same-age frozen lists (the round-2 staleness tail)."""
    from spatialsim_tpu.ops.bh_window import eval_accel_sorted
    n = 4096
    pos, vel, mass = _bodies(n, seed=23)
    exactfn = lambda st: allpairs_accel_reference(
        st.pos[:, :], st.mass, 0.1, 2.0)
    errs = {}
    for riv in (0, 4):
        cfg = _cfg(max_depth=7, group_size=64, window_groups=2,
                   list_capacity=4096, skin=2.0, pool_tile=0,
                   rebuild_interval=10 ** 6, refresh_interval=riv,
                   rebuild_drift_mode="off")
        st = init_window_state(pos, vel, mass, cfg)
        step = make_window_step(cfg, n, substeps=4)
        for _ in range(6):     # age 24 steps
            st = step(st, jnp.float32(0.05))
        stale = eval_accel_sorted(
            st.lists, st.pos, st.mass, jnp.float32(0.05), G=0.1,
            softening=2.0, group_size=64, window_groups=2,
            use_pallas=False)
        exact = exactfn(st)
        errs[riv] = float(np.median(_err_over_rms(stale, exact)))
    assert errs[4] <= errs[0] + 1e-6, errs


@pytest.mark.slow
def test_pool_eval_matches_dense_oracle(rng):
    """Pool-compacted eval == dense XLA oracle (same entries, same order)."""
    n = 4096
    pos = jnp.asarray(rng.normal(size=(3, n)) * 100, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    mass = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
    acc0 = jnp.zeros_like(pos)
    kw = dict(theta=0.8, softening=2.0, skin=2.0, max_depth=6,
              group_size=256, window_groups=2, list_cap=512)
    ld = build_lists(pos, vel, mass, acc0, **kw)
    lp = build_lists(pos, vel, mass, acc0, pool_tile=128, **kw)
    ek = dict(G=0.1, softening=2.0, group_size=256, window_groups=2)
    a_d = np.asarray(eval_accel(ld, pos, mass, jnp.float32(0.02),
                                use_pallas=False, **ek))
    a_p = np.asarray(eval_accel(lp, pos, mass, jnp.float32(0.02),
                                use_pallas=True, **ek))
    assert np.abs(a_p - a_d).max() / np.abs(a_d).max() < 1e-4


def test_pool_refresh_matches_dense(rng):
    """refresh_lists on the pool == refresh on the dense layout."""
    n = 4096
    pos = jnp.asarray(rng.normal(size=(3, n)) * 100, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    mass = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
    acc0 = jnp.zeros_like(pos)
    kw = dict(theta=0.8, softening=2.0, skin=2.0, max_depth=6,
              group_size=256, window_groups=2, list_cap=512)
    ld = build_lists(pos, vel, mass, acc0, **kw)
    lp = build_lists(pos, vel, mass, acc0, pool_tile=128, **kw)
    o = ld.order[:n]
    pos2 = pos + jnp.asarray(rng.normal(size=(3, n)) * 0.5, jnp.float32)
    args = (pos2[:, o], vel[:, o], mass[o], jnp.zeros((3, n)), 0.02,
            24.0)
    ld2 = refresh_lists(ld, *args)
    lp2 = refresh_lists(lp, *args)
    ek = dict(G=0.1, softening=2.0, group_size=256, window_groups=2)
    b_d = np.asarray(eval_accel(ld2, pos, mass, jnp.float32(0.02),
                                use_pallas=False, **ek))
    b_p = np.asarray(eval_accel(lp2, pos, mass, jnp.float32(0.02),
                                use_pallas=True, **ek))
    assert np.abs(b_p - b_d).max() / np.abs(b_d).max() < 1e-4


def test_compensated_prefix_recovers_small_segments(rng):
    """_comp_seg == float64 segment sums even when the running prefix
    dwarfs the segment (the plain-f32 failure mode: a 1-body mass
    extracted from a ~1e7 prefix loses every bit)."""
    from spatialsim_tpu.ops.bh_window import _comp_prefix, _comp_seg
    n = 200_000
    x = (rng.random((2, n)) * 100.0 + 1.0).astype(np.float32)
    x[1] *= np.sign(rng.normal(size=n)).astype(np.float32)  # mixed signs
    pref = _comp_prefix(jnp.asarray(x))
    s = jnp.asarray([0, n - 3, n // 2, 12345, n - 1], jnp.int32)
    e = jnp.asarray([n, n - 1, n // 2 + 2, 12347, n], jnp.int32)
    seg = np.asarray(_comp_seg(pref, s, e))
    ref = np.cumsum(x.astype(np.float64), axis=1)
    ref = np.concatenate([np.zeros((2, 1)), ref], axis=1)
    want = ref[:, np.asarray(e)] - ref[:, np.asarray(s)]
    assert np.abs(seg - want).max() / np.abs(want).max() < 1e-6
    # plain f32 prefixes DO fail this (guard that the test is meaningful)
    plain = np.cumsum(x, axis=1, dtype=np.float32)
    plain = np.concatenate([np.zeros((2, 1), np.float32), plain], axis=1)
    seg32 = plain[:, np.asarray(e)] - plain[:, np.asarray(s)]
    small = np.abs(want) < 1000
    assert (np.abs(seg32 - want)[small] / np.abs(want)[small]).max() > 1e-4


def test_comp_seg_chunked_matches_unchunked(rng, monkeypatch):
    """The chunked wide-input path of _comp_seg (taken above
    _COMP_SEG_CHUNK flat indices — the 50M OOM fix) is bit-identical
    to the one-shot gather."""
    import spatialsim_tpu.ops.bh_window as bw
    n = 5000
    x = (rng.random((3, n)) * 10.0 - 5.0).astype(np.float32)
    pref = bw._comp_prefix(jnp.asarray(x))
    m = 1537                      # not a multiple of the forced chunk
    s = jnp.asarray(rng.integers(0, n, size=m), jnp.int32)
    e = jnp.minimum(s + jnp.asarray(rng.integers(0, 50, size=m),
                                    jnp.int32), n)
    want = np.asarray(bw._comp_seg(pref, s, e))
    monkeypatch.setattr(bw, "_COMP_SEG_CHUNK", 256)
    got = np.asarray(bw._comp_seg(pref, s, e))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_finish_lists_group_chunked_matches(rng, monkeypatch):
    """Dense-far materialization from ranges in bounded group chunks
    (the EXTREME-scale HBM path) reproduces the unchunked lists."""
    import spatialsim_tpu.ops.bh_window as bw
    n = 8192
    pos = jnp.asarray(rng.normal(size=(3, n)) * 100 + 250, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    mass = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
    acc = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    kw = dict(theta=0.7, softening=2.0, group_size=256, window_groups=1,
              max_depth=5, list_cap=256, emit_mode="ranges")
    ref = build_lists(pos, vel, mass, acc, **kw)
    monkeypatch.setattr(bw, "_COMP_SEG_CHUNK", 512)   # CHG=2 groups
    chk = build_lists(pos, vel, mass, acc, **kw)
    np.testing.assert_array_equal(np.asarray(chk.far_n),
                                  np.asarray(ref.far_n))
    np.testing.assert_allclose(np.asarray(chk.far), np.asarray(ref.far),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_calibration_fixes_cluster_shallow_clamp(rng):
    """Dense isotropic distributions overflow the galaxy-profiled
    shallow worklist caps, force-emitting whole octants as monopoles
    (measured 10% MEDIAN force error at 100K, scripts/decide20.py);
    calibrate_config must detect the clamp from the demand probe, grow
    the caps, and collapse the error."""
    from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
    from spatialsim_tpu import distributions
    from spatialsim_tpu.ops.bh_window import (build_lists, eval_accel,
                                              _build_kw, calibrate_config,
                                              build_diagnostics)
    n = 32_768
    base = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.08, softening=3.0, damping=1.0,
        spawn_radius=700.0, distribution="cluster", engine="window"), n)
    p, v, m = distributions.generate_distribution(
        "cluster", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)

    cal = calibrate_config(base, pos, vel, mass)
    assert cal.wl_caps, "expected the cluster to clamp the default caps"
    d = build_diagnostics(pos, vel, mass, cal)
    assert "wl_demand" in d
    for dem, cap in zip(d["wl_demand"], d["wl_caps"]):
        assert dem <= cap, (d["wl_demand"], d["wl_caps"])

    idx = np.sort(np.random.default_rng(1).choice(n, 512, replace=False))
    soft_sq = base.softening ** 2

    @jax.jit
    def exact_at(tgt, pos, mass):
        def one(t):
            dd = pos - t[:, None]
            dist_sq = jnp.sum(dd * dd, axis=0) + soft_sq
            inv = jax.lax.rsqrt(dist_sq)
            w = jnp.where(dist_sq > soft_sq,
                          (base.G * mass) * inv * inv * inv, 0.0)
            return jnp.sum(w * dd, axis=1)
        return jax.lax.map(one, tgt.T).T

    e = np.asarray(exact_at(pos[:, idx], pos, mass), np.float64)
    mag = np.maximum(np.linalg.norm(e, axis=0), 1e-12)
    meds = {}
    for tag, cfg in [("default", base), ("cal", cal)]:
        lists = build_lists(pos, vel, mass, **_build_kw(cfg))
        acc = eval_accel(lists, pos, mass, jnp.float32(0.0), G=cfg.G,
                         softening=cfg.softening,
                         group_size=cfg.group_size,
                         window_groups=cfg.window_groups)
        a = np.asarray(acc[:, idx], np.float64)
        meds[tag] = np.median(np.linalg.norm(a - e, axis=0) / mag)
    assert meds["cal"] < 0.02, meds
    assert meds["cal"] < meds["default"] / 3, meds


@pytest.mark.slow
def test_ranges_emission_matches_value_emission(rng):
    """emit_mode="ranges" builds the same lists as "values": identical
    entry set (ranges/counts bit-equal), moments f32-close."""
    n = 8192
    pos = jnp.asarray(rng.normal(size=(3, n)) * 100 + 250, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    mass = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
    acc = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    kw = dict(theta=0.8, softening=2.0, skin=2.0, max_depth=6,
              group_size=256, window_groups=2, list_cap=512)
    lv = build_lists(pos, vel, mass, acc, emit_mode="values", **kw)
    lr = build_lists(pos, vel, mass, acc, emit_mode="ranges", **kw)
    assert np.array_equal(np.asarray(lv.far_n), np.asarray(lr.far_n))
    assert np.array_equal(np.asarray(lv.far_range),
                          np.asarray(lr.far_range))
    fv, fr = np.asarray(lv.far), np.asarray(lr.far)
    sel = fv[:, 6, :] > 0
    for row in range(fv.shape[1]):
        a, b = fv[:, row, :][sel], fr[:, row, :][sel]
        assert np.abs(a - b).max() <= 1e-3 + 1e-3 * np.abs(a).max(), row


@pytest.mark.slow
def test_pool_from_ranges_matches_dense_compaction(rng):
    """The direct-to-pool ranges finish == dense build + compaction
    (same tiles, same encoded ranges, f32-close moments, equal eval)."""
    n = 8192
    pos = jnp.asarray(rng.normal(size=(3, n)) * 100, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    mass = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
    acc = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    kw = dict(theta=0.8, softening=2.0, skin=2.0, max_depth=6,
              group_size=256, window_groups=2, list_cap=512)
    lpv = build_lists(pos, vel, mass, acc, emit_mode="values",
                      pool_tile=128, **kw)
    lpr = build_lists(pos, vel, mass, acc, emit_mode="ranges",
                      pool_tile=128, **kw)
    assert np.array_equal(np.asarray(lpv.pstart), np.asarray(lpr.pstart))
    assert np.array_equal(np.asarray(lpv.far_n), np.asarray(lpr.far_n))
    pv, pr = np.asarray(lpv.pool), np.asarray(lpr.pool)
    mm = pv[:, 6, :] > 0
    assert np.array_equal(np.where(mm[:, None, :], pv[:, 10:14, :], 0),
                          np.where(mm[:, None, :], pr[:, 10:14, :], 0))
    for row in range(10):
        a, b = pv[:, row, :][mm], pr[:, row, :][mm]
        assert np.abs(a - b).max() <= 1e-3 + 1e-3 * np.abs(a).max(), row
    ek = dict(G=0.1, softening=2.0, group_size=256, window_groups=2)
    a_v = np.asarray(eval_accel(lpv, pos, mass, jnp.float32(0.02),
                                use_pallas=True, **ek))
    a_r = np.asarray(eval_accel(lpr, pos, mass, jnp.float32(0.02),
                                use_pallas=True, **ek))
    assert np.abs(a_r - a_v).max() / np.abs(a_v).max() < 1e-4


def test_resolve_config_extreme_scale_guards():
    """HBM guards for the EXTREME ladder: auto emission goes
    ranges-only above 4M (values emission's dense scatter-column +
    gathered-tensor transient exhausted HBM at the 10M order-2 shape),
    depth caps at 8 above 20M, list capacity drops to 2048 at 50M."""
    from spatialsim_tpu.config.nbody import resolve_config

    small = resolve_config(NBodyConfig(num_bodies=1_000_000), 1_000_000)
    assert small.traversal_emit == "auto"       # pool decides (<= 4M)
    assert small.max_depth == 8

    ten = resolve_config(NBodyConfig(num_bodies=10_000_000), 10_000_000)
    # Pool stays on at 10M, so "auto" survives resolution and picks the
    # cellid pool finish downstream (bh_window._build_from_sorted);
    # the dense values transient is avoided either way.
    assert ten.traversal_emit == "auto"
    assert ten.max_depth == 9
    assert ten.list_capacity == 8192
    assert ten.advance_order == 2

    fifty = resolve_config(NBodyConfig(num_bodies=50_000_000), 50_000_000)
    assert fifty.traversal_emit == "ranges"
    assert fifty.max_depth == 8
    assert fifty.list_capacity == 2048
    # >20.5M: a worst-case-safe pool outweighs the dense tensor (16
    # rows/tile vs 7-10), and order-2 advance costs ~2.4 GB the
    # theta=1.4-1.5 EXTREME ladder does not repay.
    assert fifty.pool_tile == 0
    assert fifty.advance_order == 1
    assert ten.pool_tile == 512

    # Explicit user choices survive resolution.
    explicit = resolve_config(
        NBodyConfig(num_bodies=10_000_000, traversal_emit="values"),
        10_000_000)
    assert explicit.traversal_emit == "values"


@pytest.mark.slow
def test_pool_overflow_folds_groups_to_residual(rng, monkeypatch):
    """A pool whose static tile cap cannot hold every group's tiles
    folds whole groups into their mass-conserving residual (far_n=0,
    one residual entry carrying the group's ENTIRE far mass) instead of
    laying tiles out of bounds — the out-of-bounds tile DMA killed the
    first 20M run on hardware."""
    import spatialsim_tpu.ops.bh_window as bw
    n = 4096
    pos = jnp.asarray(rng.normal(size=(3, n)) * 120, jnp.float32)
    vel = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    mass = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
    acc = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    kw = dict(theta=0.8, softening=2.0, skin=2.0, max_depth=6,
              group_size=256, window_groups=2, list_cap=2048)
    ref = build_lists(pos, vel, mass, acc, emit_mode="ranges",
                      pool_tile=128, **kw)
    monkeypatch.setattr(bw, "pool_cap_tiles",
                        lambda *a, **k: 40)   # ng=16: forces folds
    jax.clear_caches()  # same static signature as `ref` — force retrace
    tiny = build_lists(pos, vel, mass, acc, emit_mode="ranges",
                       pool_tile=128, **kw)
    tile = 128
    fn_ref = np.asarray(ref.far_n)
    fn = np.asarray(tiny.far_n)
    ps = np.asarray(tiny.pstart)
    pool = np.asarray(tiny.pool)
    ct = pool.shape[0]
    # Folded groups keep exactly the residual entry (far_n counts it).
    folded = (fn == 1) & (fn_ref > 100)
    assert folded.any(), "cap 40 should force at least one fold"

    def group_mass(pool_a, ps_a, fn_a, g):
        t0 = ps_a[g]
        t1 = (ps_a[g + 1] if g + 1 < len(ps_a)
              else t0 + max(1, -(-fn_a[g] // tile)))
        return pool_a[t0:t1, 6, :].sum()

    # Every group's tiles stay in bounds, and the fold conserves the
    # group's ENTIRE far mass (entries' mass row = 6).
    ref_pool, ref_ps = np.asarray(ref.pool), np.asarray(ref.pstart)
    for g in range(fn.shape[0]):
        assert ps[g] < ct
        mg = group_mass(pool, ps, fn, g)
        mgr = group_mass(ref_pool, ref_ps, fn_ref, g)
        assert abs(mg - mgr) <= 1e-2 + 1e-3 * abs(mgr), (
            f"group {g}: far mass {mg} vs {mgr}")


@pytest.mark.parametrize("mode", ["compact", "compact-mm"])
def test_compact_emission_pool_bitexact(rng, mode):
    """Scatter-free compact emission builds the IDENTICAL pool.

    The compact path (_tile_compact / _tile_assemble /
    _finish_pool_compact) replaces every W-domain emission scatter of the
    ranges path — same entries, same per-group order (level-major,
    worklist order within a level), same folds — so the assembled pool
    must be bit-exact, not merely close.  Covers order-2 acc rows,
    per-group list_cap overflow -> residual folds, and slivers.
    """
    from spatialsim_tpu.ops.bh_window import build_lists
    n = 12000
    p, v, m = distributions.generate_distribution(
        "cluster", n, 200.0, 0.1, seed=5)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    acc = jnp.asarray(rng.standard_normal((3, n)) * 0.1, jnp.float32)
    kw = dict(theta=0.6, softening=2.0, skin=2.0, max_depth=7,
              group_size=128, window_groups=2, list_cap=256,
              pool_tile=128, with_ranges=True)
    ref = build_lists(pos, vel, mass, acc, emit_mode="ranges", **kw)
    got = build_lists(pos, vel, mass, acc, emit_mode=mode, **kw)
    assert int(jnp.max(ref.far_n)) >= kw["list_cap"] - 1, \
        "config should force at least one overflow fold"
    np.testing.assert_array_equal(np.asarray(ref.far_n),
                                  np.asarray(got.far_n))
    np.testing.assert_array_equal(np.asarray(ref.pstart),
                                  np.asarray(got.pstart))
    np.testing.assert_array_equal(np.asarray(ref.pool),
                                  np.asarray(got.pool))


def test_cellid_emission_pool_matches_ranges(rng):
    """Cell-id emission assembles the same pool as the ranges finish.

    The DEFAULT pooled path since round 5 (auto -> cellid):
    _finish_pool_cellid re-derives entry moments from the octree cell
    tables (one packed gather per slot) instead of compensated
    prefix-sum differences — the same segment sums one association
    order earlier, so moments agree to f32 rounding while the entry
    STRUCTURE (far_n, pstart, packed body-range rows) must be exact.
    Covers order-2 acc rows, list_cap overflow -> residual folds, and
    window-straddle slivers (synthetic table ids).
    """
    from spatialsim_tpu.ops.bh_window import build_lists
    n = 12000
    p, v, m = distributions.generate_distribution(
        "cluster", n, 200.0, 0.1, seed=5)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    acc = jnp.asarray(rng.standard_normal((3, n)) * 0.1, jnp.float32)
    kw = dict(theta=0.6, softening=2.0, skin=2.0, max_depth=7,
              group_size=128, window_groups=2, list_cap=256,
              pool_tile=128, with_ranges=True)
    ref = build_lists(pos, vel, mass, acc, emit_mode="ranges", **kw)
    got = build_lists(pos, vel, mass, acc, emit_mode="cellid", **kw)
    assert int(jnp.max(ref.far_n)) >= kw["list_cap"] - 1, \
        "config should force at least one overflow fold"
    np.testing.assert_array_equal(np.asarray(ref.far_n),
                                  np.asarray(got.far_n))
    np.testing.assert_array_equal(np.asarray(ref.pstart),
                                  np.asarray(got.pstart))
    # Packed body-range rows (10-13) are integers in f32 — exact.
    np.testing.assert_array_equal(np.asarray(ref.pool[:, 10:14, :]),
                                  np.asarray(got.pool[:, 10:14, :]))
    np.testing.assert_allclose(np.asarray(ref.pool),
                               np.asarray(got.pool), rtol=2e-5, atol=2e-3)


def test_cellid_unfit_group_fold_matches(rng):
    """Pool-capacity (whole-group) folds match the ranges path, and the
    static pool_cap override is honoured by the cellid finish."""
    from spatialsim_tpu.ops.bh_window import build_lists
    n = 12000
    p, v, m = distributions.generate_distribution(
        "cluster", n, 200.0, 0.1, seed=7)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    kw = dict(theta=0.7, softening=2.0, skin=2.0, max_depth=7,
              group_size=128, window_groups=2, list_cap=512,
              pool_tile=64, with_ranges=True)
    ng = -(-n // kw["group_size"])
    cap = 40 + ng + 1
    ref = build_lists(pos, vel, mass, emit_mode="ranges",
                      pool_cap=cap, **kw)
    got = build_lists(pos, vel, mass, emit_mode="cellid",
                      pool_cap=cap, **kw)
    assert ref.pool.shape[0] == cap and got.pool.shape[0] == cap
    fn_ref = np.asarray(ref.far_n)
    assert (fn_ref == 1).any(), "cap should force whole-group folds"
    np.testing.assert_array_equal(fn_ref, np.asarray(got.far_n))
    np.testing.assert_allclose(np.asarray(ref.pool),
                               np.asarray(got.pool), rtol=2e-5, atol=2e-3)


def test_compact_emission_unfit_group_fold_matches(rng):
    """Pool-capacity (whole-group) folds match the ranges path."""
    from spatialsim_tpu.ops.bh_window import build_lists
    n = 12000
    p, v, m = distributions.generate_distribution(
        "cluster", n, 200.0, 0.1, seed=7)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    kw = dict(theta=0.7, softening=2.0, skin=2.0, max_depth=7,
              group_size=128, window_groups=2, list_cap=512,
              pool_tile=64, with_ranges=True)
    # Force the cumulative capacity guard with a tiny explicit budget.
    import spatialsim_tpu.ops.bh_window as bw
    ng = -(-n // kw["group_size"])
    cap = 40 + ng + 1

    def build(mode):
        orig = bw.pool_cap_tiles
        bw.pool_cap_tiles = lambda *a, **k: cap
        try:
            return build_lists(pos, vel, mass, emit_mode=mode, **kw)
        finally:
            bw.pool_cap_tiles = orig

    ref = build("ranges")
    got = build("compact")
    fn_ref = np.asarray(ref.far_n)
    assert (fn_ref == 1).any(), "cap should force whole-group folds"
    np.testing.assert_array_equal(fn_ref, np.asarray(got.far_n))
    # The fold's moment sums run in a different (but fixed) association
    # order (per-level segment sums vs the ranges path's chunked loop),
    # so the folded residual values agree to f32 rounding, not bit-exact.
    np.testing.assert_allclose(np.asarray(ref.pool),
                               np.asarray(got.pool), rtol=2e-5, atol=2e-3)
