"""Round-3 sweep #9: MXU in-kernel target transpose vs XLA pre-transpose.

decide9 eliminated far DMA and grid size as the ~36 ms empty-kernel
sink; the remaining suspect is the XLA-side tgtT construction (a
(3, nprog, gpp, gsz) -> (gsz, ...) transpose with minor-dim 3).  This
times that construction ALONE, then the kernel with tgt_mode mxu
(identity-matmul transpose in-kernel) vs pre.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import build_lists, _build_kw
from spatialsim_tpu.ops.bh_eval_kernel import pallas_window_eval, TGT_LANES


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
    print(f"n={n:,} gsz={gsz} wg={wg} gpp={gpp} "
          f"far_mean={np.asarray(lists.far_n).mean():.0f}", flush=True)

    # The suspected sink, in isolation.
    ng = npad // gsz
    ng2 = ((ng + gpp - 1) // gpp) * gpp
    nprog = ng2 // gpp
    width = ((TGT_LANES * gpp + 127) // 128) * 128

    @jax.jit
    def mk_tgtT(sp):
        sp = jnp.pad(sp, ((0, 0), (0, (ng2 - ng) * gsz)))
        t = sp.reshape(3, nprog, gpp, gsz).transpose(3, 1, 2, 0)
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, TGT_LANES - 3)))
        t = t.reshape(gsz, nprog, gpp * TGT_LANES)
        if width != gpp * TGT_LANES:
            t = jnp.pad(t, ((0, 0), (0, 0),
                            (0, width - gpp * TGT_LANES)))
        return t.reshape(gsz, nprog * width)

    t = timeit(lambda: mk_tgtT(s_pos))
    print(f"  tgtT construction alone: {t*1e3:.1f} ms", flush=True)

    @jax.jit
    def mk_pos8(sp, sm):
        return jnp.concatenate(
            [sp, sm[None, :], jnp.zeros((4, npad), jnp.float32)], axis=0)

    t = timeit(lambda: mk_pos8(s_pos, s_mass))
    print(f"  pos8 concat alone: {t*1e3:.1f} ms", flush=True)

    for tag, kw in (
            ("mxu_full", dict(tgt_mode="mxu")),
            ("pre_full", dict(tgt_mode="pre")),
            ("mxu_empty", dict(tgt_mode="mxu",
                               dbg="nowin,nostage,notgt")),
            ("mxu_nofar", dict(tgt_mode="mxu")),
            ("mxu_g8", dict(tgt_mode="mxu", groups_per_program=8)),
    ):
        farn = (jnp.zeros_like(lists.far_n) if tag == "mxu_nofar"
                else lists.far_n)
        try:
            t = timeit(lambda: pallas_window_eval(
                s_pos, s_mass, lists.far, farn, None, lists.steps_since,
                jnp.float32(0.02), G=cfg.G, softening=cfg.softening,
                group_size=gsz, window_groups=wg,
                
                groups_per_program=kw.pop("groups_per_program", gpp),
                no_cost=True, **kw))
            print(f"  {tag}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
