"""Recorder integration: record → interrupt → resume → extend → decode.

The reference validates this only by use; here it's the SURVEY.md §4
integration suite over a TINY-preset-sized config.
"""

import numpy as np
import pytest

from spatialsim_tpu.io import codec, session
from spatialsim_tpu.tools import record as record_tool


def tiny_config(**overrides):
    cfg = {
        "session_name": "t_session",
        "name": "Test", "description": "", "category": "TINY",
        "num_bodies": 300, "theta": 0.9, "G": 0.2, "softening": 5.0,
        "damping": 1.0, "spawn_radius": 200.0, "distribution": "galaxy",
        "total_frames": 6, "dt_per_frame": 0.1, "substeps": 2,
        "target_fps": 30, "estimated_time": "~0s", "seed": 3,
    }
    cfg.update(overrides)
    return cfg


@pytest.fixture
def rec_env(tmp_path, monkeypatch):
    monkeypatch.setenv("SPATIALSIM_RECORDINGS", str(tmp_path))
    return tmp_path


def test_record_full_session(rec_env):
    cfg = tiny_config()
    record_tool.record(cfg)
    rec_dir = rec_env / "t_session"
    assert session.get_completed_frames(rec_dir) == 6
    meta = session.load_metadata(rec_dir)
    assert meta["num_bodies"] == 300
    # All frames decodable, finite, right shape.
    prev = (None, None)
    for k in range(6):
        p, c = codec.load_frame(rec_dir, k, *prev)
        assert p.shape == (300, 3) and c.shape == (300, 3)
        assert np.isfinite(p).all()
        assert (c >= 0).all() and (c <= 1).all()
        prev = (p, c)


def test_record_resume_matches_uninterrupted(rec_env):
    # Uninterrupted run (60 frames so a checkpoint lands at frame 49).
    cfg_a = tiny_config(session_name="full", total_frames=60)
    record_tool.record(cfg_a)
    # Interrupted run: stop after 52 frames, then resume from state_0049.
    cfg_b = tiny_config(session_name="split", total_frames=52)
    record_tool.record(cfg_b)
    meta = session.load_metadata(rec_env / "split")
    meta["total_frames"] = 60
    session.save_metadata(rec_env / "split", meta, meta["start_time"])
    record_tool.record(meta, resume=True)

    pa = ca = pb = cb = None
    for k in range(60):
        pa, ca = codec.load_frame(rec_env / "full", k, pa, ca)
        pb, cb = codec.load_frame(rec_env / "split", k, pb, cb)
    # Resumed trajectory equals the uninterrupted one (same jitted program,
    # same checkpointed state) up to codec quantization accumulation.
    np.testing.assert_allclose(pa, pb, atol=5e-3)


@pytest.mark.parametrize("substeps", [1, 3])
def test_substeps_divide_frame_dt(rec_env, substeps):
    """A frame advances exactly dt_per_frame of simulated time regardless
    of substeps (reference tools/record.py:749: dt = dt_per_frame/substeps).

    With G=0 and damping=1 every body moves at constant velocity, so
    frame k+1 minus frame k must equal v * dt_per_frame — not
    v * substeps * dt_per_frame (the round-1 bug this test pins).
    """
    dt_frame = 0.1
    name = f"sub{substeps}"
    cfg = tiny_config(session_name=name, G=0.0, total_frames=3,
                      dt_per_frame=dt_frame, substeps=substeps)
    record_tool.record(cfg)
    rec_dir = rec_env / name
    # Final checkpoint (frame 2) holds the exact velocities.
    _, frame = session.find_latest_state(rec_dir, 3)
    _, vel, _ = session.load_state(session.state_path(rec_dir, frame))
    p0, c0 = codec.load_frame(rec_dir, 0)
    p1, _ = codec.load_frame(rec_dir, 1, p0, c0)
    # Codec stores positions quantized to 1/1000 (delta frames).
    np.testing.assert_allclose(p1 - p0, vel * dt_frame, atol=5e-3)


def test_extend_session(rec_env):
    cfg = tiny_config(session_name="ext", total_frames=6)
    record_tool.record(cfg)
    meta = record_tool.extend_session("ext", 4)
    assert meta["total_frames"] == 10
    record_tool.record(meta, resume=True)
    assert session.get_completed_frames(rec_env / "ext") == 10


def test_cli_status_and_presets(rec_env, capsys):
    record_tool.record(tiny_config(session_name="s1"))
    assert record_tool.main(["--status"]) == 0
    out = capsys.readouterr().out
    assert "s1" in out
    assert record_tool.main(["--list-presets"]) == 0
    out = capsys.readouterr().out
    assert "bar_galaxy" not in out  # menu shows display names
    assert "Barred Spiral Galaxy" in out


@pytest.mark.slow
def test_record_with_window_engine(rec_env):
    # The production engine path the MEGA/EXTREME presets take (forced
    # here at test scale; XLA eval keeps the CPU suite fast).
    from spatialsim_tpu.config.nbody import NBodyConfig
    from spatialsim_tpu.models.nbody import NBodySimulation
    from spatialsim_tpu.ops.bh_window import WindowBHState

    cfg = tiny_config(session_name="win", num_bodies=1024, total_frames=5)
    base = record_tool.config_from_preset(cfg).replace(
        engine="window", group_size=64, list_capacity=1024,
        window_groups=2, max_depth=7, rebuild_interval=4,
        rebuild_drift_mode="off", use_pallas_eval=False)

    rec_dir = session.get_recording_dir("win")
    sim = NBodySimulation(config=base, substeps=2, seed=3)
    assert isinstance(sim.state, WindowBHState)
    # Drive the same loop shape the recorder uses.
    for k in range(5):
        sim.step_raw(0.1)
        session.save_state(rec_dir, k, sim.get_positions(),
                           sim.get_velocities(), sim.get_masses(),
                           keep_previous=True)
    p = sim.get_positions()
    assert np.isfinite(p).all()
    # Resume path restores a window-engine sim from the checkpoint.
    _, frame = session.find_latest_state(rec_dir, 10)
    pos, vel, masses = session.load_state(
        session.state_path(rec_dir, frame))
    sim2 = NBodySimulation.from_state(pos, vel, masses, config=base,
                                      substeps=2)
    assert sim2.engine == "window"
    sim2.step_raw(0.1)
    assert np.isfinite(sim2.get_positions()).all()


def test_interactive_menu_overrides(capsys):
    """Preset menu prompts for bodies/frames/theta and confirms
    (reference tools/record.py:1020-1113)."""
    answers = iter(["1", "50k", "77", "1.1", "y"])
    cfg = record_tool.select_preset_interactive(
        input_fn=lambda _prompt: next(answers))
    assert cfg is not None
    assert cfg["num_bodies"] == 50_000
    assert cfg["total_frames"] == 77
    assert cfg["theta"] == 1.1
    out = capsys.readouterr().out
    assert "Final Configuration" in out and "Estimated time" in out


def test_interactive_menu_rejects_and_quits(capsys):
    # Invalid theta keeps preset value; 'n' at confirm reprints the menu;
    # 'q' quits with None.
    answers = iter(["0", "", "", "9.9", "n", "q"])
    cfg = record_tool.select_preset_interactive(
        input_fn=lambda _prompt: next(answers))
    assert cfg is None
    out = capsys.readouterr().out
    assert "Theta must be 0.1-2.0" in out


def test_estimate_is_engine_aware():
    # TINY presets run the all-pairs engine: the n*log n window anchor
    # would predict ~100x too little; the floor keeps it sane.
    tiny = record_tool.estimate_recording_time(
        {"num_bodies": 10_000, "theta": 0.8, "total_frames": 100,
         "substeps": 1})
    assert tiny >= 100 * record_tool._EST_STEP_FLOOR_S
    big = record_tool.estimate_recording_time(
        {"num_bodies": 1_000_000, "theta": 0.8, "total_frames": 100,
         "substeps": 1})
    # The window anchor tracks the newest committed 1M bench METRIC line
    # (valid even when the whole suite's rc != 0 — metrics run in
    # isolated subprocesses), falling back to the static constant.
    assert big == pytest.approx(100 * record_tool._anchor_from_bench(),
                                rel=0.01)
    assert 1.0 / record_tool._anchor_from_bench() >= 5.0  # sane steps/s
