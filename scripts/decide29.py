"""10M geometry scan: the eval wall vs group size / window width.

diag10m_v2 showed the honest-accuracy 10M step is EVAL-bound
(~1.62 s/step eval vs ~0.42 s/step amortized rebuild).  Eval work is
~pairs = window (ng * (2wg+1) * gsz^2) + far (sum(far_n) * gsz); at the
current (gsz 1024, wg 2) the window alone is ~51G pairs/step.  This
scan measures, per geometry, WITH per-variant demand calibration:

  - force error vs one shared 2048-sample direct-sum oracle
    (median / p99 / rms) — the honesty gate (rms <= ~0.1)
  - fresh build_lists time, fused-eval marginal
  - sustained steps/s over two chained 24-step dispatches

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide29.py \
    [n] [variant_filter]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jit_cache")

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu.models.nbody import make_step_fn
from spatialsim_tpu import distributions
from spatialsim_tpu.ops import bh_window as bw


def exact_accel_at(targets, pos, mass, G, soft_sq):
    def one_chunk(tgt):
        d = pos[:, None, :] - tgt[:, :, None]
        dist_sq = jnp.sum(d * d, axis=0) + soft_sq
        inv = jax.lax.rsqrt(dist_sq)
        w = jnp.where(dist_sq > soft_sq,
                      (G * mass)[None, :] * inv * inv * inv, 0.0)
        return jnp.sum(w[None] * d, axis=2)
    m = targets.shape[1]
    c = 256
    parts = targets.reshape(3, m // c, c).transpose(1, 0, 2)
    return jax.lax.map(one_chunk, parts).transpose(1, 0, 2).reshape(3, m)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    base = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0,
        spawn_radius=500.0, distribution="cluster", engine="window",
        rebuild_interval=24), n)

    pp, vv, mm = distributions.generate_distribution(
        "cluster", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(pp.T, jnp.float32)
    vel = jnp.asarray(vv.T, jnp.float32)
    mass = jnp.asarray(mm, jnp.float32)
    del pp, vv, mm
    print(f"platform={jax.devices()[0].platform} n={n:,}", flush=True)

    rng = np.random.default_rng(1)
    idx = jnp.asarray(np.sort(rng.choice(n, 2048, replace=False)))
    exact = np.asarray(exact_accel_at(pos[:, idx], pos, mass, base.G,
                                      base.softening ** 2), np.float64)
    print("oracle ready", flush=True)

    variants = [
        ("g1024_w2", {}),                                   # baseline
        ("g512_w2", {"group_size": 512}),
        ("g512_w1", {"group_size": 512, "window_groups": 1}),
    ]
    dt = jnp.float32(0.02)
    for tag, over in variants:
        if filt and filt not in tag:
            continue
        t0 = time.time()
        try:
            cfg = base.replace(**over)
            cfg = bw.calibrate_config(cfg, pos, vel, mass)
            print(f"[{tag}] calibrated {time.time()-t0:.0f}s "
                  f"caps={list(getattr(cfg, 'wl_caps', ()) or ())} "
                  f"pool_cap={getattr(cfg, 'pool_cap', 0)}", flush=True)

            # Fresh-build error at the sample.
            from spatialsim_tpu.ops.bh_window import (init_window_state,
                                                      window_bh_accel)
            acc = window_bh_accel(pos, vel, mass, cfg)
            a = np.asarray(acc[:, idx], np.float64)
            mag = np.linalg.norm(exact, axis=0)
            err = (np.linalg.norm(a - exact, axis=0)
                   / np.maximum(mag, 1e-12))
            print(f"[{tag}] err median={np.median(err):.4f} "
                  f"p99={np.percentile(err, 99):.4f} "
                  f"rms={np.sqrt((err**2).mean()):.4f}", flush=True)
            del acc, a

            # Sustained: 2 chained 24-step dispatches (each includes
            # one rebuild at interval 24) after one warmup dispatch.
            step = make_step_fn(cfg, n, substeps=24, engine="window")
            state = init_window_state(pos, vel, mass, cfg)
            sync(state.pos)
            state = step(state, dt)
            sync(state.pos)
            t1 = time.time()
            for _ in range(2):
                state = step(state, dt)
            sync(state.pos)
            ms = (time.time() - t1) / 48.0 * 1e3
            print(json.dumps({"cfg": tag, "ms_per_step": round(ms, 1),
                              "steps_per_sec": round(1000.0 / ms, 2)}),
                  flush=True)
            del state, step
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)
        jax.clear_caches()
    print("done", flush=True)


if __name__ == "__main__":
    main()
