"""EXTREME-scale execution evidence: init, step, error sample, HBM log.

The reference's headline claim is 50M bodies offline
(`/root/reference/README.md:3`, EXTREME presets
`/root/reference/tools/presets.py:2352-2584`, theta 1.2-1.5).  This
script runs the window engine at 10M/20M/50M for a short burst and
prints the numbers that make the claim checkable here: steps/s, sampled
force error vs a direct-sum oracle, list/worklist saturation, and HBM
headroom.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/extreme_run.py \
           [n] [steps] [theta]
Defaults mirror the reference's EXTREME ladder: theta 1.2 at 10M,
1.4 at 20M, 1.5 at 50M (tools/presets.py:2352-2584).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import (
    init_window_state, make_window_step)


def default_theta(n):
    if n >= 50_000_000:
        return 1.5
    if n >= 20_000_000:
        return 1.4
    return 1.2


def hbm_stats():
    try:
        st = jax.devices()[0].memory_stats()
        return (f"HBM {st['bytes_in_use'] / 1e9:.1f} / "
                f"{st.get('bytes_limit', 0) / 1e9:.1f} GB in use")
    except Exception:  # noqa: BLE001
        return "HBM stats unavailable"


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 20_000_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    theta = float(sys.argv[3]) if len(sys.argv) > 3 else default_theta(n)
    pool_over = int(sys.argv[4]) if len(sys.argv) > 4 else -1

    cfg = resolve_config(NBodyConfig(
        num_bodies=n, theta=theta, G=0.08, softening=3.0, damping=1.0,
        spawn_radius=700.0, distribution="cluster", engine="window",
        rebuild_drift_mode="off"), n)
    if pool_over >= 0:
        cfg = cfg.replace(pool_tile=pool_over)
    print(f"n={n:,} theta={theta} depth={cfg.max_depth} "
          f"gsz={cfg.group_size} L={cfg.list_capacity} "
          f"interval={cfg.rebuild_interval} adv={cfg.advance_order} "
          f"platform={jax.devices()[0].platform}", flush=True)

    t0 = time.perf_counter()
    p, v, m = distributions.generate_distribution(
        "cluster", n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    del p, v, m
    print(f"init conditions: {time.perf_counter() - t0:.0f} s", flush=True)

    if os.environ.get("EXTREME_SKIP_CALIBRATE") != "1":
        from spatialsim_tpu.ops.bh_window import calibrate_config
        t0 = time.perf_counter()
        cfg = calibrate_config(cfg, pos, vel, mass)
        print(f"calibrate: {time.perf_counter() - t0:.0f} s "
              f"wl_caps={list(cfg.wl_caps) or 'default'}", flush=True)
    t0 = time.perf_counter()
    # Donate: at 50M the pinned non-donated args (~2 GB) are the margin
    # between the first build fitting and runtime ResourceExhausted.
    state = init_window_state(pos, vel, mass, cfg, donate=True)
    del pos, vel, mass
    jax.block_until_ready(state.pos)
    print(f"first build: {time.perf_counter() - t0:.0f} s | {hbm_stats()}",
          flush=True)

    # List/pool health: saturation and capacity folds are the two ways
    # accuracy silently degrades at EXTREME scale.
    fn = np.asarray(state.lists.far_n)
    li = f"far_n mean={fn.mean():.0f} p99={np.percentile(fn, 99):.0f} " \
         f"max={fn.max()} at_cap={(fn >= cfg.list_capacity - 1).sum()} " \
         f"folded={(fn <= 1).sum()}/{fn.shape[0]}"
    if state.lists.pool is not None:
        ps = np.asarray(state.lists.pstart)
        tiles_used = int(ps[-1] + -(-int(fn[-1]) // cfg.pool_tile))
        li += (f" | pool tiles {tiles_used}/{state.lists.pool.shape[0]}")
    print(li, flush=True)

    # Oracle sample BEFORE stepping (fresh lists): force error on 1024
    # random bodies vs direct sum over all n.
    # All oracle work runs on the SORTED state (the originals were
    # donated to the first build): original sample ids map to sorted
    # slots through inv_order; pad slots are zero-mass so the direct
    # sum over the sorted arrays is identical.
    rng = np.random.default_rng(1)
    idx = np.sort(rng.choice(n, 1024, replace=False))
    slots = jnp.asarray(np.asarray(state.lists.inv_order)[idx])
    sp, sm = state.pos, state.mass
    tgt = sp[:, slots]

    @jax.jit
    def exact_at(tgt, pos, mass):
        # Sequential per-target map: a vmapped (3, T, N) difference
        # tensor is hundreds of GB at 50M bodies.
        soft_sq = cfg.softening ** 2

        def one(t):
            d = pos - t[:, None]
            dist_sq = jnp.sum(d * d, axis=0) + soft_sq
            inv = jax.lax.rsqrt(dist_sq)
            w = jnp.where(dist_sq > soft_sq,
                          (cfg.G * mass) * inv * inv * inv, 0.0)
            return jnp.sum(w * d, axis=1)
        return jax.lax.map(one, tgt.T).T

    from spatialsim_tpu.ops.bh_window import eval_accel_sorted
    acc_bh = eval_accel_sorted(
        state.lists, sp, sm, jnp.float32(0.0), G=cfg.G,
        softening=cfg.softening, group_size=cfg.group_size,
        window_groups=cfg.window_groups,
        quadrupole=cfg.use_quadrupole)
    a = np.asarray(acc_bh[:, slots], np.float64)
    e = np.asarray(exact_at(tgt, sp, sm), np.float64)
    mag = np.linalg.norm(e, axis=0)
    err = np.linalg.norm(a - e, axis=0) / np.maximum(mag, 1e-12)
    print(f"force error (fresh lists, 1024 samples): "
          f"median={np.median(err):.4f} p99={np.percentile(err, 99):.4f} "
          f"rms={np.sqrt((err ** 2).mean()):.4f}", flush=True)
    del acc_bh, a, e, tgt

    step = make_window_step(cfg, n, substeps=1)
    dt = jnp.float32(0.015)
    state = step(state, dt)           # warm the chain (compile)
    np.asarray(state.pos[0, :1])
    print(f"step compiled | {hbm_stats()}", flush=True)

    t0 = time.perf_counter()
    for k in range(steps):
        state = step(state, dt)
        if (k + 1) % 10 == 0:
            np.asarray(state.pos[0, :1])
            el = time.perf_counter() - t0
            print(f"  step {k + 1}/{steps}: {el / (k + 1) * 1000:.0f} "
                  f"ms/step ({(k + 1) / el:.2f} steps/s)", flush=True)
    np.asarray(state.pos[0, :1])
    el = time.perf_counter() - t0
    print(f"sustained: {steps / el:.2f} steps/s "
          f"({el / steps * 1000:.0f} ms/step) over {steps} steps | "
          f"{hbm_stats()}", flush=True)
    assert np.isfinite(np.asarray(state.pos[:, :1000])).all()
    print("state finite OK", flush=True)


if __name__ == "__main__":
    main()
