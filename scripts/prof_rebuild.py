"""Profile the window-engine rebuild + eval at production scale.

Usage: PYTHONPATH=/root/repo python scripts/prof_rebuild.py [n]

Prints rebuild time, eval time, sustained step rate, and the worklist /
far-list occupancy diagnostics that drive wl_caps / list_capacity tuning.
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
    build_lists, build_diagnostics, eval_accel_sorted, init_window_state,
    make_window_step, _build_kw)


def timeit(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    # Force host transfer to defeat early-return on chained dispatches.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1] if leaf.ndim else leaf)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1] if leaf.ndim else leaf)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    # Mirror bench.py's 1M defaults exactly so numbers are comparable.
    cfg = NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window",
        max_depth=8, group_size=256, window_groups=2, list_capacity=6144,
        skin=2.0, rebuild_interval=48, rebuild_drift_mode="off")
    print(f"n={n:,} platform={jax.devices()[0].platform}", flush=True)

    p, v, m = distributions.generate_distribution(
        cfg.distribution, n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)

    diag = build_diagnostics(pos, vel, mass, cfg)
    print(json.dumps(diag, indent=1), flush=True)
    caps = np.array(diag["wl_caps"], dtype=float)
    sizes = np.array(diag["wl_sizes"][:len(caps)], dtype=float)
    print("per-level fill:",
          " ".join(f"{s/c:.2f}" for s, c in zip(sizes, caps)), flush=True)
    print(f"total slots={caps.sum()/1e6:.1f}M visited={sizes.sum()/1e6:.1f}M",
          flush=True)

    kw = _build_kw(cfg)
    acc0 = jnp.zeros_like(pos)   # production rebuilds carry accelerations
    t_build, lists = timeit(
        lambda: build_lists(pos, vel, mass, acc0, **kw))
    print(f"rebuild: {t_build*1000:.0f} ms", flush=True)

    # Production eval path: sorted state, gather-free.
    pos_s = pos[:, lists.order[:n]]
    mass_s = mass[lists.order[:n]]
    ekw = dict(G=cfg.G, softening=cfg.softening, group_size=cfg.group_size,
               window_groups=cfg.window_groups, use_pallas=True)
    t_eval, _ = timeit(
        lambda: eval_accel_sorted(lists, pos_s, mass_s, jnp.float32(0.02),
                                  **ekw))
    print(f"eval:    {t_eval*1000:.1f} ms", flush=True)

    # Sustained: chain of rebuild_interval steps (includes one rebuild).
    step = make_window_step(cfg, n, substeps=cfg.rebuild_interval)
    st = init_window_state(pos, vel, mass, cfg)
    st = step(st, jnp.float32(0.02))
    np.asarray(st.pos[0, :1])
    t0 = time.perf_counter()
    st = step(st, jnp.float32(0.02))
    np.asarray(st.pos[0, :1])
    dt_chain = time.perf_counter() - t0
    rate = cfg.rebuild_interval / dt_chain
    print(f"sustained: {rate:.2f} steps/s "
          f"({dt_chain/cfg.rebuild_interval*1000:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
