"""Round-3 sweep #8: far-DMA-bound confirmation.

decide7/8: empty kernel ~37 ms regardless of vmem/cost knobs — the
far block ((gpp, R, L) fetched whole, R=10 padded to 16 sublanes,
~1.5 GB/eval) is the suspected sink.  This scales L down (the lists are
garbage at small caps — only TIMING matters, dbg-empty mode) and checks
the dimension_semantics knob.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import build_lists, _build_kw
from spatialsim_tpu.ops.bh_eval_kernel import pallas_window_eval


def timeit(fn, reps=3):
    out = fn()
    np.asarray(out.ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print(f"platform={jax.devices()[0].platform}", flush=True)
    gsz, wg, gpp = 256, 1, 4
    base = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window",
        skin=2.0, rebuild_interval=48, rebuild_drift_mode="off"), n)
    p, v, m = distributions.generate_distribution(
        "galaxy", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)

    for L in (6144, 2048, 512):
        cfg = base.replace(group_size=gsz, window_groups=wg,
                           list_capacity=L)
        lists = build_lists(pos, vel, mass, jnp.zeros_like(pos),
                            **{**_build_kw(cfg), "pool_tile": 0})
        npad = lists.order.shape[0]
        pos_s = pos[:, lists.order[:n]]
        mass_s = mass[lists.order[:n]]
        pad = npad - n
        s_pos = jnp.concatenate(
            [pos_s, jnp.broadcast_to(pos_s[:, -1:], (3, pad))], axis=1)
        s_mass = jnp.concatenate([mass_s, jnp.zeros((pad,))])
        for tag, kw in (
                ("empty", dict(dbg="nowin,nostage,notgt")),
                ("emptyDS", dict(dbg="nowin,nostage,notgt", vmem_mb=64)),
                ("full", {}),
                ("fullDS", dict(vmem_mb=64)),
        ):
            try:
                t = timeit(lambda: pallas_window_eval(
                    s_pos, s_mass, lists.far, lists.far_n, None, lists.steps_since,
                    jnp.float32(0.02), G=cfg.G, softening=cfg.softening,
                    group_size=gsz, window_groups=wg,
                     groups_per_program=gpp,
                    no_cost=True, **kw))
                print(f"  L={L} {tag}: {t*1e3:.1f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  L={L} {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
