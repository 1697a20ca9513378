"""Offline frame recorder.

TPU-native re-design of the reference recorder (``tools/record.py:702-935``):

* Physics is one jitted multi-substep XLA program with donated state — the
  whole frame (``substeps`` × force+integrate) is a single device dispatch,
  state never leaves HBM (vs the reference's per-substep kernel calls).
* Frame capture is **asynchronous double-buffering**: while the device
  computes frame ``k+1``, the host finishes the device→host copy of frame
  ``k`` and writes it to disk.  This is the TPU analogue of the reference's
  "never block the step loop on IO" design (its answer was the compressor
  thread; ours adds the transfer overlap).
* Same session layout, codec, checkpoint cadence (every 50 frames,
  trailing-delete), resume/extend contract and CLI flags.  The reference's
  ``--dt`` no-op bug (flag wrote ``config["dt"]`` but the loop read
  ``dt_per_frame``, ``tools/record.py:1280`` vs ``:749``) is fixed here:
  ``--dt`` sets ``dt_per_frame``.
* Colors use the recorder-hardcoded ``max_speed=15.0``
  (reference ``tools/record.py:826,860``).
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Optional

import numpy as np

from spatialsim_tpu import presets as presets_lib
from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu.io import (
    BackgroundCompressor, get_completed_frames, find_latest_state,
    get_recording_dir, load_metadata, load_state, save_frame, save_metadata,
    save_state, list_recordings)
from spatialsim_tpu.io.session import STATE_INTERVAL

RECORD_MAX_SPEED_COLOR = 15.0

# TPU throughput anchors for the wall-clock estimator, measured on a v5e
# chip (sustained, incl. list rebuilds).  The reference anchors one CPU
# model at 70 ms/step @100K (tools/record.py:993-1017) regardless of
# backend; here the anchor follows the ENGINE the model will actually
# pick (models/nbody.resolve_engine): Pallas all-pairs below the
# threshold (dispatch-floor dominated at TINY sizes), the windowed BH
# engine above it (n*log n from the measured 1M sustained rate).  The
# window anchor is read from the newest committed bench record
# (BENCH_r*.json at the repo root) so engine speedups don't silently
# turn ETAs into fiction; the constant is the last hand-checked value.
_EST_ANCHOR_N = 1_000_000
_EST_ANCHOR_THETA = 0.8
_EST_ANCHOR_STEP_S = 1.0 / 10.6
# Per-step dispatch/transfer floor (any engine, tiny N) and all-pairs
# pair rate; calibrated against a TINY 10K run (scripts/eval_bench.py).
_EST_STEP_FLOOR_S = 0.004
_EST_ALLPAIRS_PAIRS_PER_S = 1.2e12


def _anchor_from_bench() -> float:
    """Newest committed 1M steps/s bench value -> anchor seconds/step.

    Scans BENCH_r*.json next to the package for the LAST run carrying the
    ``nbody_steps_per_sec_1000k_theta0.8`` metric line; falls back to
    :data:`_EST_ANCHOR_STEP_S`.  The metric line itself is trusted even
    when the whole suite's rc != 0 — bench.py runs each metric in its own
    subprocess, so a later metric's failure (e.g. a 10M OOM) does not
    invalidate the 1M number, and requiring rc == 0 pinned ETAs to the
    last fully-green round's (stale) speed.
    """
    import glob
    import json
    import os
    import re
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    best = None
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            rec = json.loads(open(path).read())
        except (OSError, ValueError):
            continue
        m = re.search(
            r'"metric":\s*"nbody_steps_per_sec_1000k_theta0\.8",\s*'
            r'"value":\s*([0-9.eE+-]+)', rec.get("tail", ""))
        if m and float(m.group(1)) > 0:
            best = float(m.group(1))
    return 1.0 / best if best else _EST_ANCHOR_STEP_S


def estimate_recording_time(config: dict) -> float:
    """Engine-aware wall-clock estimate (seconds) for a preset recording."""
    import math
    from spatialsim_tpu.config.nbody import NBodyConfig
    n = int(config["num_bodies"])
    theta = float(config.get("theta", 0.8))
    steps = int(config["total_frames"]) * int(config.get("substeps", 1))
    if n <= NBodyConfig().allpairs_threshold:
        # All-pairs Pallas engine: n^2 pair rate with a dispatch floor.
        step_s = max(_EST_STEP_FLOOR_S,
                     n * n / _EST_ALLPAIRS_PAIRS_PER_S)
    else:
        scale = (n * math.log(max(n, 2))) / (
            _EST_ANCHOR_N * math.log(_EST_ANCHOR_N))
        theta_scale = (_EST_ANCHOR_THETA / theta) ** 2
        step_s = max(_EST_STEP_FLOOR_S,
                     _anchor_from_bench() * scale * theta_scale)
    return steps * step_s


def config_from_preset(preset: dict) -> NBodyConfig:
    """Map a preset dict onto the physics config."""
    return NBodyConfig(
        num_bodies=int(preset["num_bodies"]),
        theta=float(preset["theta"]),
        G=float(preset["G"]),
        softening=float(preset["softening"]),
        damping=float(preset["damping"]),
        spawn_radius=float(preset["spawn_radius"]),
        distribution=preset.get("distribution", "galaxy"),
    )


def format_time(seconds: float) -> str:
    seconds = int(seconds)
    if seconds < 60:
        return f"{seconds}s"
    if seconds < 3600:
        return f"{seconds // 60}m{seconds % 60:02d}s"
    return f"{seconds // 3600}h{(seconds % 3600) // 60:02d}m"


def _bar(frac: float, width: int = 40) -> str:
    filled = int(frac * width)
    return "█" * filled + "░" * (width - filled)


def print_progress(frame: int, total: int, frame_time: float, elapsed: float,
                   eta: float, comp_stats: dict, first: bool) -> None:
    """Nested render + compression bars (ANSI cursor reuse).

    Mirrors the reference recorder's two-bar display with a compression
    ETA derived from its rolling timing ring
    (``/root/reference/tools/record.py:598-677``): the second bar tracks
    the background compressor through the frames rendered so far, ETA =
    backlog x average per-frame pack time.
    """
    frac = (frame + 1) / total
    render = (f"Render:   {frac * 100:5.1f}% | frame {frame + 1:5d}/{total}"
              f" | {frame_time * 1000:6.1f} ms/frame"
              f" | elapsed {format_time(elapsed):>6s} | ETA "
              f"{format_time(eta):>6s}")
    done = comp_stats["compressed"]
    if done:
        backlog = max(0, (frame + 1) - done)
        comp_eta = backlog * comp_stats["avg_time"]
        comp = (f"Compress: {done / total * 100:5.1f}% | frame {done:5d}"
                f"/{total} | {comp_stats['avg_time'] * 1000:6.1f} ms/frame"
                f" | backlog {backlog:5d} | ETA {format_time(comp_eta):>6s}")
        if comp_stats.get("failures"):
            comp += f" | {comp_stats['failures']} kept raw"
    else:
        comp = "Compress: waiting for first batch..."
    if not first:
        sys.stdout.write("\033[4A")
    sys.stdout.write(f"\033[K[{_bar(frac)}]\n\033[K{render}\n"
                     f"\033[K[{_bar(done / total)}]\n\033[K{comp}\n")
    sys.stdout.flush()


def record(config: dict, resume: bool = False) -> None:
    """Run (or resume) one offline recording session."""
    # Import lazily so --status/--list don't pay for a device handshake
    # (mirrors the reference's lazy heavy-import pattern, record.py:705).
    import jax
    from spatialsim_tpu.models.nbody import NBodySimulation
    from spatialsim_tpu.ops.colors import colors_by_velocity

    rec_dir = get_recording_dir(config["session_name"])
    total_frames = int(config["total_frames"])
    substeps = int(config.get("substeps", 1))
    dt_frame = float(config["dt_per_frame"])
    sim_cfg = config_from_preset(config)

    start_frame = 0
    sim: Optional[NBodySimulation] = None

    if resume:
        completed = get_completed_frames(rec_dir)
        if completed > 0:
            print(f"[Record] Found {completed} completed frames")
            state_file, state_frame = find_latest_state(rec_dir, completed)
            if state_file is not None:
                print(f"[Record] Loading state from frame {state_frame}")
                positions, velocities, masses = load_state(state_file)
                sim = NBodySimulation.from_state(
                    positions, velocities, masses,
                    config=sim_cfg, substeps=substeps)
                start_frame = state_frame + 1
                print(f"[Record] Resuming from frame {start_frame}")
            else:
                print("[Record] No state checkpoint; restarting from frame 0")

    if sim is None:
        print(f"[Record] New session: {config['session_name']}")
        print(f"[Record] Bodies: {sim_cfg.num_bodies:,}  θ={sim_cfg.theta}  "
              f"distribution={sim_cfg.distribution}")
        print(f"[Record] Frames: {total_frames}  dt={dt_frame}  "
              f"substeps={substeps}")
        sim = NBodySimulation(config=sim_cfg, substeps=substeps,
                              seed=int(config.get("seed", 0)))
        save_metadata(rec_dir, config)

    color_fn = jax.jit(
        lambda vel: colors_by_velocity(vel, RECORD_MAX_SPEED_COLOR).T)

    compressor = BackgroundCompressor(rec_dir)
    compressor.start()
    print(f"\n[Record] Computing on {jax.devices()[0].platform} "
          f"from frame {start_frame}; Ctrl-C pauses (resumable)\n")

    start_time = time.time()
    frame_times: list = []
    pending = None  # (frame_idx, pos_device, col_device)
    frame = start_frame

    def flush_pending():
        nonlocal pending
        if pending is None:
            return
        idx, pos_dev, col_dev = pending
        save_frame(rec_dir, idx, np.asarray(pos_dev), np.asarray(col_dev))
        compressor.check_and_queue(idx)
        pending = None

    # Each frame advances dt_per_frame of simulated time, split into
    # `substeps` equal sub-iterations (reference tools/record.py:749:
    # dt = dt_per_frame / substeps).  make_step_fn scans `substeps`
    # iterations of the dt we pass, so we pass the divided value.
    dt_sub = dt_frame / max(substeps, 1)

    try:
        for frame in range(start_frame, total_frames):
            t0 = time.time()
            sim.step_raw(dt_sub)
            # Device-side capture prep (original body order — the window
            # engine's state lives Morton-sorted internally); transfer
            # overlaps the next step.
            pos_o, vel_o = sim.device_frame()
            pos_dev = pos_o.T
            col_dev = color_fn(vel_o)
            try:
                pos_dev.copy_to_host_async()
                col_dev.copy_to_host_async()
            except AttributeError:  # older jax array types
                pass
            flush_pending()
            pending = (frame, pos_dev, col_dev)

            if (frame + 1) % STATE_INTERVAL == 0:
                save_state(rec_dir, frame, sim.get_positions(),
                           sim.get_velocities(), sim.get_masses())

            frame_times.append(time.time() - t0)
            del frame_times[:-10]
            avg = sum(frame_times) / len(frame_times)
            print_progress(frame, total_frames, frame_times[-1],
                           time.time() - start_time,
                           avg * (total_frames - frame - 1),
                           compressor.stats(),
                           first=(frame == start_frame))
        flush_pending()
        # Final checkpoint so --extend resumes instantly (the reference
        # only has whatever 50-multiple survived, so extending a finished
        # session recomputes up to 49 frames; tools/record.py:866-876).
        save_state(rec_dir, total_frames - 1, sim.get_positions(),
                   sim.get_velocities(), sim.get_masses(),
                   keep_previous=True)
        compressor.compress_remaining(total_frames)
        compressor.stop()
        s = compressor.stats()
        print(f"\n[Record] ✓ Complete in {format_time(time.time() - start_time)}")
        print(f"[Compress] {s['compressed']} frames packed, "
              f"{s['ratio'] * 100:.1f}% size reduction")
        print(f"[Record] Output: {rec_dir}")
        print(f"[Record] Playback: python -m spatialsim_tpu.tools.playback "
              f"{config['session_name']}")
    except KeyboardInterrupt:
        flush_pending()
        print(f"\n\n[Record] Paused at frame {frame}")
        save_state(rec_dir, frame, sim.get_positions(), sim.get_velocities(),
                   sim.get_masses(), keep_previous=True)
        print("[Record] Finishing compression of staged frames...")
        compressor.compress_remaining(frame + 1)
        compressor.stop()
        print(f"[Record] To resume: python -m spatialsim_tpu.tools.record "
              f"--resume {config['session_name']}")


def select_preset_interactive(input_fn=input) -> Optional[dict]:
    """Preset menu with per-field overrides and a confirm step.

    Mirrors the reference's interactive flow
    (``/root/reference/tools/record.py:1020-1113``): select by index,
    show the config, prompt for bodies/frames/theta overrides (Enter
    keeps the preset value; theta clamped to 0.1-2.0), re-estimate the
    wall clock, confirm before returning.  ``input_fn`` is injectable for
    tests.  Returns None on quit/EOF.
    """
    presets_lib.print_preset_menu()
    max_idx = len(presets_lib.get_preset_list()) - 1
    while True:
        try:
            choice = input_fn("\n  Selection: ").strip().lower()
        except (EOFError, KeyboardInterrupt):
            print("\n  Cancelled.")
            return None
        if choice in ("q", "quit", "exit", ""):
            print("\n  Cancelled.")
            return None
        try:
            idx = int(choice)
        except ValueError:
            print(f"  Invalid input. Enter a number 0-{max_idx} or 'q'.")
            continue
        key, preset = presets_lib.get_preset_by_index(idx)
        if key is None:
            print(f"  Invalid selection. Enter 0-{max_idx} or 'q' to quit.")
            continue
        config = presets_lib.get_preset_config(key)
        print(f"\n  Selected: [{idx}] {preset.get('name', key)}")
        print(f"  Distribution: {config['distribution']}")
        print(f"  Bodies: {config['num_bodies']:,}")
        print(f"  Frames: {config['total_frames']}")
        print(f"  Theta: {config['theta']}")
        print("\n  --- Optional Overrides (press Enter to skip) ---")
        try:
            raw = input_fn(f"  Bodies [{config['num_bodies']:,}]: ").strip()
            if raw:
                try:
                    val = presets_lib.parse_number(raw)
                    if val > 0:
                        config["num_bodies"] = val
                        print(f"    -> Bodies set to {val:,}")
                except ValueError:
                    print(f"    -> Invalid, keeping {config['num_bodies']:,}")
            raw = input_fn(f"  Frames [{config['total_frames']}]: ").strip()
            if raw:
                try:
                    val = int(raw)
                    if val > 0:
                        config["total_frames"] = val
                        print(f"    -> Frames set to {val}")
                except ValueError:
                    print(f"    -> Invalid, keeping {config['total_frames']}")
            raw = input_fn(f"  Theta [{config['theta']}]: ").strip()
            if raw:
                try:
                    val = float(raw)
                    if 0.1 <= val <= 2.0:
                        config["theta"] = val
                        print(f"    -> Theta set to {val}")
                    else:
                        print(f"    -> Theta must be 0.1-2.0, keeping "
                              f"{config['theta']}")
                except ValueError:
                    print(f"    -> Invalid, keeping {config['theta']}")
        except (EOFError, KeyboardInterrupt):
            print("\n  Cancelled.")
            return None
        est = estimate_recording_time(config)
        print("\n  --- Final Configuration ---")
        print(f"  Bodies: {config['num_bodies']:,}")
        print(f"  Frames: {config['total_frames']}")
        print(f"  Theta: {config['theta']}")
        print(f"  Estimated time: ~{format_time(est)}")
        try:
            confirm = input_fn("\n  Start recording? [Y/n]: ").strip().lower()
        except (EOFError, KeyboardInterrupt):
            print("\n  Cancelled.")
            return None
        if confirm in ("", "y", "yes"):
            return config
        presets_lib.print_preset_menu()


def print_status() -> None:
    rows = list_recordings()
    if not rows:
        print("No recordings found")
        return
    print(f"{'session':<28} {'frames':>12} {'bodies':>10} {'distribution':<14}")
    print("-" * 70)
    for name, meta, done, total in rows:
        print(f"{name:<28} {done:>5}/{total:<6} "
              f"{meta.get('num_bodies', 0):>10,} "
              f"{meta.get('distribution', '?'):<14}")


def extend_session(session: str, extra_frames: int) -> Optional[dict]:
    """Raise total_frames in metadata and return the updated config."""
    rec_dir = get_recording_dir(session, create=False)
    if not (rec_dir / "metadata.json").exists():
        print(f"[Record] Unknown session {session}")
        return None
    meta = load_metadata(rec_dir)
    meta["total_frames"] = int(meta["total_frames"]) + extra_frames
    save_metadata(rec_dir, meta, meta.get("start_time"))
    print(f"[Record] Extended {session} to {meta['total_frames']} frames")
    return meta


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Record an N-body simulation to frames (TPU-accelerated)")
    p.add_argument("session", nargs="?", help="session name (for --resume)")
    p.add_argument("--preset", help="preset key (see --list-presets)")
    p.add_argument("--preset-id", type=int, help="preset menu index")
    p.add_argument("--resume", metavar="SESSION", nargs="?", const="",
                   help="resume a paused session")
    p.add_argument("--extend", type=int, metavar="N",
                   help="add N frames to a finished session and resume")
    p.add_argument("--status", action="store_true",
                   help="list recordings and their progress")
    p.add_argument("--list", dest="list_", action="store_true",
                   help="alias for --status")
    p.add_argument("--list-presets", action="store_true")
    p.add_argument("--list-distributions", action="store_true")
    p.add_argument("--estimate", action="store_true",
                   help="print the wall-clock estimate and exit")
    p.add_argument("--bodies", type=str, help="override body count (k/m ok)")
    p.add_argument("--frames", type=int, help="override total frames")
    p.add_argument("--theta", type=float, help="override Barnes-Hut theta")
    p.add_argument("--dt", type=float, help="override dt per frame")
    p.add_argument("--substeps", type=int, help="override substeps")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--name", help="session name override")
    args = p.parse_args(argv)

    if args.status or args.list_:
        print_status()
        return 0
    if args.list_presets:
        presets_lib.print_preset_menu()
        return 0
    if args.list_distributions:
        presets_lib.list_distributions()
        return 0

    session = args.session or (args.resume if args.resume else None)
    if args.extend is not None:
        if not session:
            p.error("--extend requires a session name")
        meta = extend_session(session, args.extend)
        if meta is None:
            return 1
        record(meta, resume=True)
        return 0
    if args.resume is not None:
        if not session:
            p.error("--resume requires a session name")
        rec_dir = get_recording_dir(session, create=False)
        if not (rec_dir / "metadata.json").exists():
            print(f"[Record] Unknown session {session}")
            return 1
        record(load_metadata(rec_dir), resume=True)
        return 0

    config = None
    if args.preset:
        config = presets_lib.get_preset_config(args.preset)
        if config is None:
            print(f"Unknown preset {args.preset!r}; use --list-presets")
            return 1
    elif args.preset_id is not None:
        key, _ = presets_lib.get_preset_by_index(args.preset_id)
        if key is None:
            print(f"Preset index {args.preset_id} out of range")
            return 1
        config = presets_lib.get_preset_config(key)
    else:
        config = select_preset_interactive()
        if config is None:
            return 0

    # CLI overrides (precedence: preset < flag; reference :1263-1281).
    if args.bodies:
        config["num_bodies"] = presets_lib.parse_number(args.bodies)
    if args.frames:
        config["total_frames"] = args.frames
    if args.theta:
        config["theta"] = args.theta
    if args.dt:
        config["dt_per_frame"] = args.dt
    if args.substeps:
        config["substeps"] = args.substeps
    if args.seed:
        config["seed"] = args.seed
    if args.name:
        config["session_name"] = args.name

    est = estimate_recording_time(config)
    print(f"[Record] Estimated compute: ~{format_time(est)} "
          f"({config['num_bodies']:,} bodies x "
          f"{config['total_frames']} frames)")
    if args.estimate:
        return 0

    record(config, resume=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
