"""Benchmark harness: the three BASELINE metrics on the real chip.

Default (no args) runs the full suite and prints THREE JSON lines, one per
BASELINE.json metric:

1. ``nbody_steps_per_sec_1000k_theta0.8`` — physics steps/sec at 1M bodies
   (bar_galaxy-scale, window engine).  Baseline: the reference's own ETA
   anchor — 70 ms/step at 100K bodies on CPU (``tools/record.py:996-1002``)
   scaled by its n·log n model to 1M => ~0.84 s/step = 1.19 steps/s.
2. ``nbody_frame_time_ms_10000k`` — 10M-body (Plummer cluster, EXTREME
   scale) frame time in ms/step.  Baseline: the same anchor model at 10M.
3. ``boids_steps_per_sec_100k`` — boid steps/sec at 100K agents.
   Baseline: the reference claims 500K agents "interactive" on CPU
   (``config/boids.py:31``); we anchor 100K at 30 steps/s (its uncapped
   interactive target frame rate).

``--only {1m,10m,boids}`` runs a single metric; the legacy tuning flags
apply to the nbody lines.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

# Persistent compilation cache: the 1M/10M step programs take minutes to
# compile through the remote-compile tunnel; a warm cache turns the
# driver's end-of-round run into seconds of compile.  Must be set before
# jax is imported anywhere below.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jit_cache")

# Hard per-metric wall budget (seconds).  Round 4 lost two metrics when
# the 10M OOM burned the driver's whole suite budget (BENCH_r04 rc=124);
# a metric that cannot finish inside its budget is reported as failed and
# the suite moves on.  Generous enough for a cold compile of the largest
# program.
METRIC_TIMEOUT_S = {"boids": 420, "boids500k": 420, "1m": 900, "10m": 900}


def reference_steps_per_sec(n: int, theta: float) -> float:
    """Reference CPU anchor extrapolated with its own n·log n x (0.8/θ)²
    scaling model (tools/record.py:993-1017)."""
    anchor_n, anchor_theta, anchor_ms = 100_000, 0.8, 70.0
    scale = (n * math.log(max(n, 2))) / (anchor_n * math.log(anchor_n))
    theta_scale = (anchor_theta / theta) ** 2
    return 1000.0 / (anchor_ms * scale * theta_scale)


BOIDS_BASELINE_100K = 30.0  # steps/s, reference interactive claim scale


def _sync(x):
    import numpy as np
    # Force a host transfer: on the axon platform block_until_ready can
    # return early on chained donated dispatches.
    np.asarray(x[0, :1])


def bench_nbody(n, theta, steps, warmup, chain, distribution, engine,
                group_size, depth, list_cap, skin, rebuild_interval,
                drift_mode, refresh_interval=0, emit_mode="auto",
                pool_tile=-1, verbose=False):
    """Sustained steps/s with `chain` physics steps per device dispatch."""
    import jax
    import jax.numpy as jnp
    from spatialsim_tpu.config.nbody import NBodyConfig
    from spatialsim_tpu.models.nbody import NBodyState, make_step_fn
    from spatialsim_tpu import distributions

    cfg = NBodyConfig(num_bodies=n, theta=theta, G=0.1, softening=2.0,
                      damping=1.0, spawn_radius=500.0,
                      distribution=distribution, engine=engine,
                      group_size=group_size, max_depth=depth,
                      window_groups=2, list_capacity=list_cap, skin=skin,
                      rebuild_interval=rebuild_interval,
                      refresh_interval=refresh_interval,
                      rebuild_drift_mode=drift_mode,
                      traversal_emit=emit_mode)
    if pool_tile >= 0:
        cfg = cfg.replace(pool_tile=pool_tile)
    if verbose:
        print(f"[bench] platform={jax.devices()[0].platform} n={n:,} "
              f"theta={theta} engine={engine}", file=sys.stderr)

    pos, vel, mass = distributions.generate_distribution(
        distribution, n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(pos.T, jnp.float32)
    vel = jnp.asarray(vel.T, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    if engine == "window":
        # Demand-calibrate the worklist caps on the real initial
        # conditions (no-op for the galaxy profile; grows the shallow
        # caps on dense isotropic distributions — the 10M cluster's
        # rms-0.86 error tail was clamp-folding, scripts/decide20.py).
        from spatialsim_tpu.ops.bh_window import calibrate_config
        cfg = calibrate_config(cfg, pos, vel, mass)
    # Sustained throughput: `chain` steps per dispatch (lax.scan), as the
    # recorder does per frame — measures true device step rate including
    # periodic list rebuilds, not the ~30 ms tunnel dispatch latency.
    step = make_step_fn(cfg, n, substeps=chain, engine=engine)
    if engine == "window":
        from spatialsim_tpu.ops.bh_window import init_window_state
        state = init_window_state(pos, vel, mass, cfg)
        # Warmup must cross a rebuild so BOTH device programs compile
        # outside the timed region (above HOST_SCHEDULED_THRESHOLD the
        # rebuild is a separate jit that first fires at steps_since >=
        # rebuild_interval).
        warmup = max(warmup, rebuild_interval // max(chain, 1) + 1)
    else:
        state = NBodyState(pos=pos, vel=vel, mass=mass)
    dt = jnp.float32(0.02)

    t0 = time.time()
    for _ in range(warmup):
        state = step(state, dt)
        _sync(state.pos)
    if verbose:
        print(f"[bench] warmup+compile {time.time() - t0:.1f}s",
              file=sys.stderr)

    dispatches = max(1, steps // chain)
    t0 = time.time()
    for _ in range(dispatches):
        state = step(state, dt)
        _sync(state.pos)
    elapsed = time.time() - t0
    return dispatches * chain / elapsed


def bench_boids(n, steps, warmup, chain, verbose=False):
    import jax.numpy as jnp
    from spatialsim_tpu.config.boids import BoidsConfig
    from spatialsim_tpu.models.boids import Flock, make_step_fn

    cfg = BoidsConfig(num_boids=n)
    flock = Flock(config=cfg, seed=0)
    step = make_step_fn(cfg, substeps=chain)
    if verbose:
        print(f"[bench] boids n={n:,} mode={flock.neighbor_mode}",
              file=sys.stderr)
    state = flock.state
    dt = jnp.float32(1.0 / 30.0)
    for _ in range(warmup):
        state = step(state, dt)
        _sync(state.pos)
    dispatches = max(1, steps // chain)
    t0 = time.time()
    for _ in range(dispatches):
        state = step(state, dt)
        _sync(state.pos)
    elapsed = time.time() - t0
    return dispatches * chain / elapsed


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--only", choices=["1m", "10m", "boids", "boids500k"],
                   help="run a single metric (default: the full suite)")
    p.add_argument("--bodies", type=int, default=0,
                   help="override body count for the nbody metric")
    p.add_argument("--theta", type=float, default=0.8)
    p.add_argument("--steps", type=int, default=96)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--chain", type=int, default=48,
                   help="physics steps per device dispatch")
    p.add_argument("--distribution", default="galaxy")
    p.add_argument("--engine",
                   choices=["auto", "allpairs", "exact", "window"],
                   default="window")
    p.add_argument("--group-size", type=int, default=256)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--list-cap", type=int, default=6144)
    p.add_argument("--skin", type=float, default=2.0)
    p.add_argument("--rebuild-interval", type=int, default=24,
                   help="24 = the measured honest-accuracy default "
                        "(worst-of-interval rms at the fresh floor)")
    p.add_argument("--refresh-interval", type=int, default=0,
                   help="moment-refresh cadence between rebuilds (0 off)")
    p.add_argument("--drift-mode", choices=["max", "off"], default="off")
    p.add_argument("--emit-mode", default="auto",
                   choices=["auto", "values", "ranges", "compact",
                            "compact-mm"],
                   help="traversal emission mode (config.traversal_emit)")
    p.add_argument("--pool-tile", type=int, default=-1,
                   help="far-list pool tile (-1 = config default)")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    if args.only is None:
        # Full suite: one SUBPROCESS per metric.  Isolation matters twice
        # over on the chip: (a) a failure in one metric (e.g. HBM
        # exhaustion at 10M) must not cost the remaining metrics their
        # numbers — round 3's rc=1 recorded nothing; (b) each metric
        # starts with a clean HBM arena instead of inheriting the
        # previous scale's resident buffers.
        # Cheapest-first so a slow/failing heavy metric can never cost the
        # cheap ones their numbers; each metric under a hard wall budget.
        passthrough = list(sys.argv[1:])
        failures = 0
        for job in ["boids", "boids500k", "1m", "10m"]:
            try:
                rc = subprocess.call(
                    [sys.executable, os.path.abspath(__file__),
                     "--only", job] + passthrough,
                    timeout=METRIC_TIMEOUT_S[job])
            except subprocess.TimeoutExpired:
                rc = -9
            if rc != 0:
                failures += 1
                print(f"[bench] metric {job} FAILED rc={rc}",
                      file=sys.stderr, flush=True)
        return 1 if failures == 4 else 0

    jobs = [args.only]
    common = dict(theta=args.theta, warmup=args.warmup,
                  engine=args.engine, skin=args.skin,
                  drift_mode=args.drift_mode, verbose=args.verbose)

    for job in jobs:
        if job == "1m":
            n = args.bodies or 1_000_000
            rate = bench_nbody(
                n=n, steps=args.steps, chain=args.chain,
                distribution=args.distribution, group_size=args.group_size,
                depth=args.depth, list_cap=args.list_cap,
                rebuild_interval=args.rebuild_interval,
                refresh_interval=args.refresh_interval,
                emit_mode=args.emit_mode, pool_tile=args.pool_tile,
                **common)
            baseline = reference_steps_per_sec(n, args.theta)
            print(json.dumps({
                "metric": f"nbody_steps_per_sec_{n // 1000}k_theta{args.theta}",
                "value": round(rate, 3),
                "unit": "steps/s",
                "vs_baseline": round(rate / baseline, 2),
            }), flush=True)
        elif job == "10m":
            n = args.bodies or 10_000_000
            # EXTREME cluster scale: auto-tuned engine geometry
            # (resolve_config), shorter chain so the suite stays minutes.
            rate = bench_nbody(
                n=n, steps=48, chain=24, distribution="cluster",
                group_size=0, depth=0, list_cap=0,
                rebuild_interval=args.rebuild_interval, **common)
            frame_ms = 1000.0 / rate
            base_ms = 1000.0 / reference_steps_per_sec(n, args.theta)
            print(json.dumps({
                "metric": f"nbody_frame_time_ms_{n // 1000}k",
                "value": round(frame_ms, 1),
                "unit": "ms/step",
                "vs_baseline": round(base_ms / frame_ms, 2),
            }), flush=True)
        elif job in ("boids", "boids500k"):
            n = args.bodies or (500_000 if job == "boids500k" else 100_000)
            rate = bench_boids(n=n, steps=96, warmup=args.warmup, chain=24,
                               verbose=args.verbose)
            # The 500K line is the reference's DEFAULT agent count
            # (config/boids.py:31); its CPU anchor scales the 100K one
            # linearly in n (grid + Numba loop are O(n)).
            baseline = BOIDS_BASELINE_100K * 100_000 / n
            print(json.dumps({
                "metric": f"boids_steps_per_sec_{n // 1000}k",
                "value": round(rate, 3),
                "unit": "steps/s",
                "vs_baseline": round(rate / baseline, 2),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
