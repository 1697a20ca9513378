"""Round-3 sweep #12: rebuild budget/geometry sweep.

Rebuild is the biggest step term (2.16 s at 1M, amortized 45 ms at
interval 48) and its cost is proportional to the STATIC worklist caps.
The auto budget is 4.2*npad regardless of measured demand — this sweeps
the budget down (overflow degrades entries to bounded-error residuals)
and group size up, reporting rebuild time + fresh-list force error.
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


def timeit(fn, reps=3):
    out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


@jax.jit
def exact_at(tgt, pos, mass, G, soft_sq):
    def one(t):
        d = pos - t[:, None]
        dist_sq = jnp.sum(d * d, axis=0) + soft_sq
        inv = jax.lax.rsqrt(dist_sq)
        w = jnp.where(dist_sq > soft_sq, (G * mass) * inv * inv * inv,
                      0.0)
        return jnp.sum(w * d, axis=1)
    return jax.lax.map(one, tgt.T).T


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print(f"platform={jax.devices()[0].platform}", flush=True)
    base = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, G=0.1, softening=2.0, damping=1.0,
        spawn_radius=500.0, distribution="galaxy", engine="window",
        skin=2.0, rebuild_interval=48, rebuild_drift_mode="off"), n)
    p, v, m = distributions.generate_distribution(
        "galaxy", n, base.spawn_radius, base.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    rng = np.random.default_rng(1)
    idx = jnp.asarray(np.sort(rng.choice(n, 2048, replace=False)))
    ex = np.asarray(exact_at(pos[:, idx], pos, mass, base.G,
                             base.softening ** 2), np.float64)
    exn = np.linalg.norm(ex, axis=0)

    for gsz, wg, budget in ((256, 1, 0), (256, 1, 3_000_000),
                            (256, 1, 2_000_000), (256, 1, 1_500_000),
                            (512, 1, 0), (256, 2, 2_000_000)):
        cfg = base.replace(group_size=gsz, window_groups=wg,
                           list_capacity=6144, worklist_budget=budget)
        kw = _build_kw(cfg)
        try:
            t, lists = timeit(lambda: build_lists(
                pos, vel, mass, jnp.zeros_like(pos), **kw))
            acc = eval_accel_sorted(
                lists, pos[:, lists.order[:n]], mass[lists.order[:n]],
                jnp.float32(0.0), G=cfg.G, softening=cfg.softening,
                group_size=gsz, window_groups=wg)
            inv = np.zeros(n, np.int32)
            inv[np.asarray(lists.order[:n])] = np.arange(n)
            a = np.asarray(acc[:, inv[np.asarray(idx)]], np.float64)
            err = np.linalg.norm(a - ex, axis=0) / np.maximum(exn, 1e-12)
            fn = np.asarray(lists.far_n)
            print(f"  gsz={gsz} W{wg} B={budget or 'auto'}: rebuild "
                  f"{t*1e3:.0f} ms | err med={np.median(err):.4f} "
                  f"p99={np.percentile(err, 99):.4f} "
                  f"rms={np.sqrt((err**2).mean()):.4f} | "
                  f"far mean={fn.mean():.0f} max={fn.max()}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  gsz={gsz} W{wg} B={budget}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
