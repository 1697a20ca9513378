"""A/B the eval kernel forms + re-profile the rebuild at 1M on TPU.

One process, incremental prints (compiles are slow and serial — never
kill this mid-run).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import (
    build_lists, eval_accel_sorted, _build_kw)
from spatialsim_tpu.ops.bh_eval_kernel import pallas_window_eval


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = 1_000_000
    cfg = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window",
        skin=2.0, rebuild_interval=48, rebuild_drift_mode="off"), n)
    print(f"n={n:,} platform={jax.devices()[0].platform}", flush=True)
    p, v, m = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    kw = _build_kw(cfg)
    kw["pool_tile"] = 0   # these sweeps exercise the dense layout
    acc0 = jnp.zeros_like(pos)

    t_build = timeit(lambda: build_lists(pos, vel, mass, acc0, **kw))
    print(f"rebuild (intervals, K=0): {t_build*1e3:.0f} ms", flush=True)
    lists = build_lists(pos, vel, mass, acc0, **kw)

    gsz = cfg.group_size
    n_real = pos.shape[1]
    pos_s = pos[:, lists.order[:n_real]]
    mass_s = mass[lists.order[:n_real]]
    npad = lists.order.shape[0]
    padn = npad - n_real
    s_pos = (jnp.concatenate(
        [pos_s, jnp.broadcast_to(pos_s[:, -1:], (3, padn))], axis=1)
        if padn else pos_s)
    s_mass = (jnp.concatenate([mass_s, jnp.zeros((padn,))])
              if padn else mass_s)


    common = dict(G=cfg.G, softening=cfg.softening, group_size=gsz,
                  window_groups=cfg.window_groups,
                  far_tile=cfg.eval_far_tile,
                  groups_per_program=cfg.eval_groups_per_program)
    for tag, mx in (("vpu", False), ("mxu", True)):
        t = timeit(lambda mx=mx: pallas_window_eval(
            s_pos, s_mass, lists.far, lists.far_n, None, lists.steps_since, jnp.float32(0.02),
            use_mxu=mx, **common))
        print(f"kernel-only eval [{tag}]: {t*1e3:.1f} ms", flush=True)

    t_eval = timeit(lambda: eval_accel_sorted(
        lists, pos_s, mass_s, jnp.float32(0.02), G=cfg.G,
        softening=cfg.softening, group_size=gsz,
        window_groups=cfg.window_groups, use_pallas=True))
    print(f"full eval_accel_sorted (vpu): {t_eval*1e3:.1f} ms", flush=True)

    # K=8 variant: rebuild + eval with near groups.
    kw8 = dict(kw, near_groups=8)
    t_b8 = timeit(lambda: build_lists(pos, vel, mass, acc0, **kw8))
    print(f"rebuild (K=8): {t_b8*1e3:.0f} ms", flush=True)
    lists8 = build_lists(pos, vel, mass, acc0, **kw8)
    pos_s8 = pos[:, lists8.order[:n_real]]
    mass_s8 = mass[lists8.order[:n_real]]
    t_e8 = timeit(lambda: eval_accel_sorted(
        lists8, pos_s8, mass_s8, jnp.float32(0.02), G=cfg.G,
        softening=cfg.softening, group_size=gsz,
        window_groups=cfg.window_groups, use_pallas=True))
    print(f"eval (K=8, mxu): {t_e8*1e3:.1f} ms | far_n mean="
          f"{float(jnp.mean(lists8.far_n)):.0f} vs "
          f"{float(jnp.mean(lists.far_n)):.0f}", flush=True)


if __name__ == "__main__":
    main()
