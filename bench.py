"""Benchmark harness: flagship N-body step rate on the real chip.

Headline metric (BASELINE.md): physics steps/sec at 1M bodies, theta=0.8,
Barnes-Hut.  Baseline is the reference's own ETA anchor — 70 ms/step at
100K bodies on CPU (reference ``tools/record.py:996-1002``) scaled by its
n·log n model to 1M bodies => ~0.84 s/step = 1.19 steps/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time


def reference_steps_per_sec(n: int, theta: float) -> float:
    """Reference CPU anchor extrapolated with its own n·log n x (0.8/θ)²
    scaling model (tools/record.py:993-1017)."""
    anchor_n, anchor_theta, anchor_ms = 100_000, 0.8, 70.0
    scale = (n * math.log(max(n, 2))) / (anchor_n * math.log(anchor_n))
    theta_scale = (anchor_theta / theta) ** 2
    return 1000.0 / (anchor_ms * scale * theta_scale)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--bodies", type=int, default=1_000_000)
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
    p.add_argument("--depth", type=int, default=9)
    p.add_argument("--list-cap", type=int, default=6144)
    p.add_argument("--skin", type=float, default=6.0)
    p.add_argument("--rebuild-interval", type=int, default=48)
    p.add_argument("--drift-mode", choices=["max", "off"], default="off")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from spatialsim_tpu.config.nbody import NBodyConfig
    from spatialsim_tpu.models.nbody import NBodyState, make_step_fn
    from spatialsim_tpu import distributions

    n = args.bodies
    engine = args.engine if args.engine != "auto" else (
        "allpairs" if n <= 32_768 else "window")
    cfg = NBodyConfig(num_bodies=n, theta=args.theta, G=0.1, softening=2.0,
                      damping=1.0, spawn_radius=500.0,
                      distribution=args.distribution, engine=engine,
                      group_size=args.group_size, max_depth=args.depth,
                      window_groups=3, list_capacity=args.list_cap,
                      skin=args.skin,
                      rebuild_interval=args.rebuild_interval,
                      rebuild_drift_mode=args.drift_mode)

    if args.verbose:
        print(f"[bench] platform={jax.devices()[0].platform} n={n:,} "
              f"theta={args.theta} engine={engine}", file=sys.stderr)

    pos, vel, mass = distributions.generate_distribution(
        args.distribution, n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(pos.T, jnp.float32)
    vel = jnp.asarray(vel.T, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    # Sustained throughput: `chain` physics steps run inside one device
    # dispatch (lax.scan), as the recorder does per frame — this measures
    # true device step rate including periodic list rebuilds, not the
    # ~30 ms per-dispatch tunnel latency.
    chain = args.chain
    step = make_step_fn(cfg, n, substeps=chain, engine=engine)
    if engine == "window":
        from spatialsim_tpu.ops.bh_window import init_window_state
        state = init_window_state(pos, vel, mass, cfg)
    else:
        state = NBodyState(pos=pos, vel=vel, mass=mass)
    dt = jnp.float32(0.02)

    t0 = time.time()
    for _ in range(args.warmup):
        state = step(state, dt)
        _ = np.asarray(state.pos[0, :1])  # force full sync (axon-safe)
    if args.verbose:
        print(f"[bench] warmup+compile {time.time() - t0:.1f}s",
              file=sys.stderr)

    dispatches = max(1, args.steps // chain)
    t0 = time.time()
    for _ in range(dispatches):
        state = step(state, dt)
        _ = np.asarray(state.pos[0, :1])
    elapsed = time.time() - t0
    args.steps = dispatches * chain

    steps_per_sec = args.steps / elapsed
    baseline = reference_steps_per_sec(n, args.theta)
    print(json.dumps({
        "metric": f"nbody_steps_per_sec_{n // 1000}k_theta{args.theta}",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
