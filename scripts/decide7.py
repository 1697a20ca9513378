"""Round-3 sweep #6: in-kernel cost decomposition of the eval kernel.

decide6 falsified both transpose hypotheses: with targets pre-transposed
AND the window loop restructured to mirror the far tile loop, nofar
still costs ~50 ms at 1M W1 (pair math theory ~5 ms).  This nulls out
kernel stages one at a time (dbg static knob) to find the real sink:
  base      : everything on (far lists too)
  nofar     : far_n = 0
  now       : + window loop off
  nost      : + staging copies off
  notg      : + target reads replaced by constants
  nouttr    : output transpose replaced by a scalar-dependent fill
Also re-times the winner shapes at gsz 512.
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


def run(n, gsz, wg, gpp):
    base = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window",
        skin=2.0, rebuild_interval=48, rebuild_drift_mode="off"), n)
    cfg = base.replace(group_size=gsz, window_groups=wg,
                       list_capacity=6144)
    p, v, m = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    lists = build_lists(pos, vel, mass, jnp.zeros_like(pos),
                        **{**_build_kw(cfg), "pool_tile": 0})
    npad = lists.order.shape[0]
    pos_s = pos[:, lists.order[:n]]
    mass_s = mass[lists.order[:n]]
    pad = npad - n
    s_pos = jnp.concatenate(
        [pos_s, jnp.broadcast_to(pos_s[:, -1:], (3, pad))], axis=1)
    s_mass = jnp.concatenate([mass_s, jnp.zeros((pad,))])
    fz = jnp.zeros_like(lists.far_n)
    print(f"n={n:,} gsz={gsz} wg={wg} gpp={gpp} "
          f"far_mean={np.asarray(lists.far_n).mean():.0f}", flush=True)

    for tag, farn, dbg in (
            ("base", lists.far_n, ""),
            ("nofar", fz, ""),
            ("now", fz, "nowin"),
            ("nost", fz, "nowin,nostage"),
            ("notg", fz, "nowin,nostage,notgt"),
            ("notg_uttr", fz, "nowin,nostage,notgt,nouttr"),
            ("nouttr", fz, "nouttr"),
            ("base_uttr", lists.far_n, "nouttr"),
    ):
        try:
            t = timeit(lambda: pallas_window_eval(
                s_pos, s_mass, lists.far, farn, None, lists.steps_since,
                jnp.float32(0.02), G=cfg.G, softening=cfg.softening,
                group_size=gsz, window_groups=wg, 
                groups_per_program=gpp, dbg=dbg))
            print(f"  {tag}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print(f"platform={jax.devices()[0].platform}", flush=True)
    run(n, 256, 1, 8)
    run(n, 512, 1, 4)
    print("done", flush=True)


if __name__ == "__main__":
    main()
