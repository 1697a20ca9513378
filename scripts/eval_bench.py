"""Eval cost microbench via no-rebuild step chains at production scale.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/eval_bench.py [n]

Times a 16-substep scan (no rebuild inside) per config — the honest
per-step eval+integrate cost as the jitted step actually runs it.
``jax.block_until_ready`` can return early on this platform and eagerly
materialized kernel inputs trigger re-layout copies, so microbenching the
Pallas call in isolation is misleading; this chains through the real step.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import init_window_state, make_window_step

SUB = 16


VARIANTS = {
    "tile512_wg2": {},
    "tile256_wg2": {"eval_far_tile": 256},
    "tile128_wg2": {"eval_far_tile": 128},
    "tile256_wg1": {"eval_far_tile": 256, "window_groups": 1},
    "tile256_quad": {"eval_far_tile": 256, "use_quadrupole": True,
                     "quad_accept_scale": 1.0},
    "xla_fallback": {"use_pallas_eval": False},
    # Timing-only probes (physics-breaking list truncation is fine here).
    "probe_L1024": {"list_capacity": 1024},
    "probe_L2048": {"list_capacity": 2048},
    "probe_wg1": {"window_groups": 1},
    "probe_gpp1": {"eval_groups_per_program": 1},
    "probe_gpp8": {"eval_groups_per_program": 8},
    "probe_adv1": {"advance_order": 1},
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    only = sys.argv[2] if len(sys.argv) > 2 else None
    base = NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, spawn_radius=500.0,
        distribution="galaxy", engine="window", max_depth=8, group_size=256,
        window_groups=2, list_capacity=6144, skin=6.0,
        rebuild_interval=10 ** 6, rebuild_drift_mode="off",
        use_quadrupole=False)
    pp, vv, mm = distributions.generate_distribution(
        "galaxy", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(pp.T, jnp.float32)
    vel = jnp.asarray(vv.T, jnp.float32)
    mass = jnp.asarray(mm, jnp.float32)

    # One variant per process: consecutive variants in one process leave
    # the previous state + executables resident and the next build dies
    # with an async InvalidArgument (HBM pressure on the shared chip).
    items = ([(only, VARIANTS[only])] if only
             else list(VARIANTS.items())[:1])
    for tag, over in items:
        cfg = base.replace(**over)
        st = init_window_state(pos, vel, mass, cfg)
        step = make_window_step(cfg, n, substeps=SUB)
        st = step(st, jnp.float32(0.02))
        np.asarray(st.pos[0, :1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            st = step(st, jnp.float32(0.02))
            np.asarray(st.pos[0, :1])
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / SUB * 1000
        print(f"{tag:14s}: {ms:6.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
