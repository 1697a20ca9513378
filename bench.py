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
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--distribution", default="galaxy")
    p.add_argument("--engine", choices=["auto", "allpairs", "barnes_hut"],
                   default="barnes_hut")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from spatialsim_tpu.config.nbody import NBodyConfig
    from spatialsim_tpu.models.nbody import NBodyState, make_step_fn
    from spatialsim_tpu import distributions

    n = args.bodies
    thr = 0 if args.engine == "barnes_hut" else (
        1 << 62 if args.engine == "allpairs" else 32_768)
    cfg = NBodyConfig(num_bodies=n, theta=args.theta, G=0.1, softening=2.0,
                      damping=1.0, spawn_radius=500.0,
                      distribution=args.distribution,
                      allpairs_threshold=thr)

    if args.verbose:
        print(f"[bench] platform={jax.devices()[0].platform} n={n:,} "
              f"theta={args.theta} engine={args.engine}", file=sys.stderr)

    pos, vel, mass = distributions.generate_distribution(
        args.distribution, n, cfg.spawn_radius, cfg.G, seed=0)
    state = NBodyState(pos=jnp.asarray(pos.T, jnp.float32),
                       vel=jnp.asarray(vel.T, jnp.float32),
                       mass=jnp.asarray(mass, jnp.float32))
    step = make_step_fn(cfg, n, substeps=1)
    dt = jnp.float32(0.02)

    t0 = time.time()
    for _ in range(args.warmup):
        state = step(state, dt)
    jax.block_until_ready(state.pos)
    if args.verbose:
        print(f"[bench] warmup+compile {time.time() - t0:.1f}s",
              file=sys.stderr)

    # Block every step: the axon remote platform's block_until_ready on a
    # queued-but-undispatched chain can return early, so chained timing
    # under-reports; per-step blocking adds only dispatch latency.
    t0 = time.time()
    for _ in range(args.steps):
        state = step(state, dt)
        jax.block_until_ready(state.pos)
    elapsed = time.time() - t0

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
