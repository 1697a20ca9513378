"""Round-2 scan: depth-8 window refinements + sustained step rates.

Usage: PYTHONPATH=/root/repo python scripts/nbody_scan2.py [n]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import (window_bh_accel, build_diagnostics,
                                          init_window_state)
from spatialsim_tpu.models.nbody import make_step_fn
from scripts.nbody_error_scan import exact_accel_at, report


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    base = NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, spawn_radius=500.0,
        distribution="galaxy", engine="window", max_depth=8, group_size=256,
        window_groups=3, list_capacity=6144, skin=6.0,
        rebuild_interval=48, rebuild_drift_mode="off")

    pp, vv, mm = distributions.generate_distribution(
        "galaxy", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(pp.T, jnp.float32)
    vel = jnp.asarray(vv.T, jnp.float32)
    mass = jnp.asarray(mm, jnp.float32)

    rng = np.random.default_rng(1)
    idx = jnp.asarray(np.sort(rng.choice(n, 2048, replace=False)))
    exact = np.asarray(exact_accel_at(pos[:, idx], pos, mass, base.G,
                                      base.softening ** 2))
    print("oracle ready", flush=True)

    for tag, over in [
        ("d8_wg2", {"window_groups": 2}),
        ("d7", {"max_depth": 7}),
        ("d8_L8192", {"list_capacity": 8192}),
    ]:
        cfg = base.replace(**over)
        t0 = time.perf_counter()
        acc = window_bh_accel(pos, vel, mass, cfg)
        np.asarray(acc[0, :1])
        acc2 = window_bh_accel(pos, vel, mass, cfg)
        t1 = time.perf_counter()
        np.asarray(acc2[0, :1])
        report(tag, acc[:, idx], exact, time.perf_counter() - t1)

    diag = build_diagnostics(pos, vel, mass, base)
    print(json.dumps({k: diag[k] for k in
                      ("wl_caps", "wl_sizes", "far_n_mean", "far_n_max",
                       "groups_at_cap")}), flush=True)

    # Sustained rates at d8, intervals 48 and 96.
    for interval in (48, 96):
        cfg = base.replace(rebuild_interval=interval)
        step = make_step_fn(cfg, n, substeps=interval)
        # Copies: the jitted step donates its state, which would free the
        # shared pos/vel buffers for later iterations.
        st = init_window_state(jnp.copy(pos), jnp.copy(vel),
                               jnp.copy(mass), cfg)
        st = step(st, jnp.float32(0.02))
        np.asarray(st.pos[0, :1])
        t0 = time.perf_counter()
        st = step(st, jnp.float32(0.02))
        np.asarray(st.pos[0, :1])
        dt = time.perf_counter() - t0
        print(json.dumps({"sustained_interval": interval,
                          "steps_per_sec": round(interval / dt, 2),
                          "ms_per_step": round(dt / interval * 1000, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
