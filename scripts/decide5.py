"""Round-3 sweep #4: row-kernel iblk sweep + cost decomposition + boids A/B.

decide4 killed the column kernel (3.5x slower: chunk-loop overhead).
Remaining eval question: where do the ~20 ms the pair count can't
explain go?  (a) iblk sweep — (iblk, S) temporaries at iblk 256 are
~64 vregs each, far past the register file, so Mosaic may be spilling;
(b) far_n := 0 decomposition isolates fixed + window cost.  Also A/Bs
the boids window accumulate (XLA vs the new Pallas kernel) at 500K.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import (
    build_lists, eval_accel_sorted, _build_kw)


def timeit(fn, *args, reps=3):
    out = fn(*args)
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


def nbody_part(n):
    base = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window",
        skin=2.0, rebuild_interval=48, rebuild_drift_mode="off"), n)
    p, v, m = distributions.generate_distribution(
        "galaxy", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    acc0 = jnp.zeros_like(pos)
    cfg = base.replace(group_size=256, window_groups=1,
                       list_capacity=6144)
    kw = _build_kw(cfg)
    lists = build_lists(pos, vel, mass, acc0, **kw)
    pos_s = pos[:, lists.order[:n]]
    mass_s = mass[lists.order[:n]]
    ref = None
    for tag, lst, ekw in (
            ("W1_iblk256", lists, dict()),
            ("W1_iblk128", lists, dict(iblk=128)),
            ("W1_iblk64", lists, dict(iblk=64)),
            ("W1_iblk32", lists, dict(iblk=32)),
            ("W1_nofar_iblk256", lists._replace(
                far_n=jnp.zeros_like(lists.far_n)), dict()),
            ("W1_nofar_iblk64", lists._replace(
                far_n=jnp.zeros_like(lists.far_n)), dict(iblk=64)),
    ):
        ek = dict(G=cfg.G, softening=cfg.softening, group_size=256,
                  window_groups=1, use_pallas=True, **ekw)
        try:
            t = timeit(lambda: eval_accel_sorted(
                lists=lst, pos_s=pos_s, mass_s=mass_s,
                dt=jnp.float32(0.02), **ek))
            a = np.asarray(eval_accel_sorted(
                lists=lst, pos_s=pos_s, mass_s=mass_s,
                dt=jnp.float32(0.02), **ek))
            if tag == "W1_iblk256":
                ref = a
            dev = (np.abs(a - ref).max() / np.abs(ref).max()
                   if (ref is not None and "nofar" not in tag)
                   else float("nan"))
            print(f"{tag}: {t*1e3:.1f} ms (dev {dev:.2e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)


def boids_part(n):
    from spatialsim_tpu.config.boids import BoidsConfig
    from spatialsim_tpu.models.boids import init_boids_window_state
    from spatialsim_tpu.ops.boids_ops import _window_accumulate
    cfg = BoidsConfig(num_boids=n, neighbor_mode="window")
    rng = np.random.default_rng(3)
    pos = jnp.asarray((rng.random((3, n)) - 0.5) * 2 * cfg.bounds,
                      jnp.float32)
    vel = jnp.asarray((rng.random((3, n)) - 0.5) * 10, jnp.float32)
    col = jnp.asarray(rng.random((3, n)), jnp.float32)
    st = init_boids_window_state(pos, vel, col, cfg)
    gsz, wg = cfg.group_size, cfg.window_groups
    npad = st.p21.shape[0]
    pad = npad - n
    ppos = jnp.concatenate(
        [st.pos, jnp.full((3, pad), 1e9, jnp.float32)], axis=1)
    pvel = jnp.pad(st.vel, ((0, 0), (0, pad)))
    pcol = jnp.pad(st.col, ((0, 0), (0, pad)))
    print(f"boids n={n:,} gsz={gsz} wg={wg} npad={npad}", flush=True)
    kw = dict(gsz=gsz, wg=wg,
              perception_sq=jnp.float32(cfg.perception_radius ** 2),
              separation_sq=jnp.float32(cfg.separation_radius ** 2))
    for tag, up in (("xla", False), ("pallas", True)):
        fn = jax.jit(lambda a, b, c: _window_accumulate(
            a, b, c, None, use_pallas=up, **kw))
        try:
            t = timeit(lambda: fn(ppos, pvel, pcol))
            print(f"boids accumulate [{tag}]: {t*1e3:.1f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"boids [{tag}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:250]}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print(f"platform={jax.devices()[0].platform}", flush=True)
    nbody_part(n)
    boids_part(500_000)
    boids_part(100_000)
    print("done", flush=True)


if __name__ == "__main__":
    main()
