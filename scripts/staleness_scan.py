"""Force-error growth of aged interaction lists at production scale.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/staleness_scan.py [n]

Runs the window engine with NO rebuilds from one initial build, and at
tau in {0, 24, 48, 96} steps measures the aged-list force error against
a direct-sum oracle at the *current* (drifted) positions.  This is the
measurement that sets rebuild_interval / skin defaults: the interval is
safe while the staleness term stays small against the theta-level floor.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import (
    eval_accel_sorted, init_window_state, make_window_step, window_bh_accel)


@jax.jit
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


def err_stats(acc, exact, idx):
    a = np.asarray(acc[:, idx], np.float64)
    e = np.asarray(exact, np.float64)
    mag = np.linalg.norm(e, axis=0)
    err = np.linalg.norm(a - e, axis=0) / np.maximum(mag, 1e-12)
    return (round(float(np.median(err)), 5),
            round(float(np.percentile(err, 99)), 5),
            round(float(np.sqrt((err ** 2).mean())), 5))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    skin = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    wg = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    gsz = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    # Moment-refresh cadence under test (0 = frozen lists, the round-2
    # behaviour).  With refreshes the taus measure only the GEOMETRIC
    # acceptance decay — the quantity that now sets rebuild_interval.
    refresh_iv = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    dt = jnp.float32(0.02)
    from spatialsim_tpu.config.nbody import resolve_config
    cfg = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, spawn_radius=500.0,
        distribution="galaxy", engine="window", max_depth=8, group_size=gsz,
        window_groups=wg, list_capacity=6144, skin=skin,
        rebuild_interval=10 ** 6, rebuild_drift_mode="off",
        refresh_interval=refresh_iv,
        use_quadrupole=False), n)
    pp, vv, mm = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(pp.T, jnp.float32)
    vel = jnp.asarray(vv.T, jnp.float32)
    mass = jnp.asarray(mm, jnp.float32)

    rng = np.random.default_rng(1)
    idx = jnp.asarray(np.sort(rng.choice(n, 2048, replace=False)))

    st = init_window_state(pos, vel, mass, cfg)
    # Warm-up: the init build has zero accelerations (first interval is
    # ballistic); run a few steps and cross one rebuild so the measured
    # lists carry real cell accelerations (advance_order=2).
    wstep = make_window_step(cfg.replace(rebuild_interval=4), n, substeps=5)
    st = wstep(st, dt)
    np.asarray(st.pos[0, :1])
    print(f"# warmup done, steps_since={int(st.lists.steps_since)}, "
          f"advance_order={cfg.advance_order}", flush=True)

    ekw = dict(G=cfg.G, softening=cfg.softening, group_size=cfg.group_size,
               window_groups=cfg.window_groups, use_pallas=True)
    if len(sys.argv) > 6:
        taus = [int(t) for t in sys.argv[6].split(",")]   # any 8-multiples
    else:
        taus = [0, 24, 48, 96] if not refresh_iv else [0, 24, 48, 96, 192]
    step8 = make_window_step(cfg, n, substeps=8)
    for i, tau in enumerate(taus):
        if tau:
            for _ in range((tau - taus[i - 1]) // 8):
                st = step8(st, dt)
            np.asarray(st.pos[0, :1])
        exact = exact_accel_at(st.pos[:, idx], st.pos, st.mass, cfg.G,
                               cfg.softening ** 2)
        stale = eval_accel_sorted(st.lists, st.pos, st.mass, dt, **ekw)
        med_s, p99_s, rms_s = err_stats(stale, exact, idx)
        fresh = window_bh_accel(st.pos, st.vel, st.mass, cfg)
        med_f, p99_f, rms_f = err_stats(fresh, exact, idx)
        drift = float(jnp.max(jnp.abs(st.pos - st.lists.ref_pos)))
        p95 = float(jnp.percentile(
            jnp.max(jnp.abs(st.pos - st.lists.ref_pos), axis=0), 95))
        print(json.dumps({
            "tau": tau, "skin": skin,
            "stale": {"med": med_s, "p99": p99_s, "rms": rms_s},
            "fresh": {"med": med_f, "p99": p99_f, "rms": rms_f},
            "drift_max": round(drift, 2), "drift_p95": round(p95, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
