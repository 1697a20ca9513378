"""Round-3 sweep #10: dispatch-floor-free eval timings.

decide10 exposed a ~36 ms PER-DISPATCH floor on this tunnel (a bare
32 MB concat "took" 37 ms) — every single-dispatch kernel timing this
round carried it, and cross-process comparisons are invalid if the
floor drifts.  Gold standard here: K evals chained inside ONE jit with
a data dependence; marginal cost = (t_K - t_1) / (K - 1).  All variants
in one process.
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

    # Dispatch floor: a trivial jitted op on a tiny array.
    tiny = jnp.zeros((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    print(f"  dispatch floor (tiny op): {timeit(lambda: f_tiny(tiny))*1e3:.1f} ms",
          flush=True)

    base = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window",
        skin=2.0, rebuild_interval=48, rebuild_drift_mode="off"), n)
    p, v, m = distributions.generate_distribution(
        "galaxy", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)

    for gsz, wg, gpp, tm in ((256, 1, 4, "mxu"), (256, 1, 4, "pre"),
                             (256, 1, 8, "mxu"), (256, 2, 4, "mxu"),
                             (512, 1, 4, "mxu")):
        cfg = base.replace(group_size=gsz, window_groups=wg,
                           list_capacity=6144)
        lists = build_lists(pos, vel, mass, jnp.zeros_like(pos),
                            **{**_build_kw(cfg), "pool_tile": 0})
        npad = lists.order.shape[0]
        pos_s = pos[:, lists.order[:n]]
        mass_s = mass[lists.order[:n]]
        pad = npad - n
        s_pos = jnp.concatenate(
            [pos_s, jnp.broadcast_to(pos_s[:, -1:], (3, pad))], axis=1)
        s_mass = jnp.concatenate([mass_s, jnp.zeros((pad,))])
        fm = float(np.asarray(lists.far_n).mean())

        def mk_chain(K, farn):
            @jax.jit
            def chain(sp, s_mass, far, farn):
                def body(c, _):
                    acc = pallas_window_eval(
                        c, s_mass, far, farn, None, lists.steps_since,
                        jnp.float32(0.02), G=cfg.G,
                        softening=cfg.softening, group_size=gsz,
                        window_groups=wg,
                        groups_per_program=gpp, no_cost=True,
                        tgt_mode=tm)
                    return c + 1e-12 * acc[:, :npad] * 0.0 + 1e-30 * acc[:, :npad], None
                out, _ = jax.lax.scan(body, sp, None, length=K)
                return out
            return lambda sp, fn=farn: chain(sp, s_mass, lists.far, fn)

        try:
            c1 = mk_chain(1, lists.far_n)
            c9 = mk_chain(9, lists.far_n)
            t1 = timeit(lambda: c1(s_pos))
            t9 = timeit(lambda: c9(s_pos))
            marg = (t9 - t1) / 8
            c1z = mk_chain(1, jnp.zeros_like(lists.far_n))
            c9z = mk_chain(9, jnp.zeros_like(lists.far_n))
            margz = (timeit(lambda: c9z(s_pos))
                     - timeit(lambda: c1z(s_pos))) / 8
            print(f"  gsz={gsz} W{wg} g{gpp} {tm}: marginal eval "
                  f"{marg*1e3:.1f} ms | nofar {margz*1e3:.1f} ms | "
                  f"far_mean={fm:.0f}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  gsz={gsz} W{wg} g{gpp} {tm}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
