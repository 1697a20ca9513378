"""Distributed-sample-sort rebuild vs replicated-sort fallback (8 dev).

VERDICT round-2 task 6 evidence: on the 8-virtual-CPU-device mesh, time
the sharded window step's rebuild substep with (a) the distributed
sample-sort path and (b) the replicated-argsort fallback (forced by a
cap_factor that always overflows).  CPU timings are indicative only,
but the distributed path does ~1/D of the sort work per device by
construction; the log is the driver-checkable artifact.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/distsort_bench.py [n]
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from spatialsim_tpu.config.nbody import NBodyConfig  # noqa: E402
from spatialsim_tpu import distributions  # noqa: E402
from spatialsim_tpu.parallel import make_mesh  # noqa: E402
from spatialsim_tpu.parallel import sharded as sh  # noqa: E402
from spatialsim_tpu.parallel import distsort  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    D = 8
    if len(jax.devices()) < D:
        print(f"need {D} devices, have {len(jax.devices())} — set "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8")
        return 1
    mesh = make_mesh(D)
    cfg = NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=300.0, distribution="galaxy", engine="window",
        max_depth=7, group_size=256, window_groups=2,
        list_capacity=2048, skin=2.0, rebuild_interval=1,
        rebuild_drift_mode="off")
    p, v, m = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)

    results = {}
    for tag, cap in (("distributed", 2.0), ("replicated", 1e-9)):
        # cap_factor ~0 forces every bin to overflow -> ok=False ->
        # the replicated gather+argsort branch runs every rebuild.
        orig = distsort.sample_sort_local

        def patched(*a, **kw):
            kw["cap_factor"] = cap
            return orig(*a, **kw)

        distsort.sample_sort_local = patched
        try:
            step, init = sh.make_sharded_window_step(
                cfg, n, mesh, substeps=2)
            st = init(pos, vel, mass)
            st = step(st, jnp.float32(0.01))     # compile + first pair
            np.asarray(st.pos[0, :1])
            t0 = time.perf_counter()
            for _ in range(3):                   # 6 substeps, 6 rebuilds
                st = step(st, jnp.float32(0.01))
            np.asarray(st.pos[0, :1])
            dt_w = (time.perf_counter() - t0) / 6
            results[tag] = dt_w
            print(f"  {tag} rebuild-every-substep: {dt_w*1e3:.0f} "
                  f"ms/substep", flush=True)
        finally:
            distsort.sample_sort_local = orig

    if results["distributed"] < results["replicated"]:
        ratio = results["replicated"] / results["distributed"]
        print(f"distributed sample-sort rebuild beats replicated by "
              f"{ratio:.2f}x on the 8-device CPU mesh", flush=True)
    else:
        print("WARNING: distributed path not faster on this host",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
