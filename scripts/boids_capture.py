"""Measure boids window-mode pair capture at production scale.

Usage: PYTHONPATH=/root/repo python scripts/boids_capture.py

Compares single vs two-pass Morton window capture against a chunked
brute-force oracle on a body sample, for uniform and clustered (settled
flock) distributions at 100K agents with the production config.
"""

import sys

import numpy as np
import jax.numpy as jnp

import spatialsim_tpu.ops.boids_ops as B
from spatialsim_tpu.config.boids import BoidsConfig
from spatialsim_tpu.ops.morton import _spread3


def sampled_exact_counts(pos_np, idx, radius, chunk=512):
    p = pos_np.astype(np.float64)
    out = np.zeros(len(idx), np.int64)
    for k in range(0, len(idx), chunk):
        tgt = p[:, idx[k:k + chunk]]
        d2 = ((tgt[:, :, None] - p[:, None, :]) ** 2).sum(axis=0)
        out[k:k + chunk] = ((d2 > 0.0001) & (d2 < radius ** 2)).sum(axis=1)
    return out


def capture(pos_np, cfg, gsz, wg, sh, wgb, sample=4000):
    n = pos_np.shape[1]
    pos = jnp.asarray(pos_np, jnp.float32)
    vel = jnp.zeros_like(pos)
    col = jnp.zeros_like(pos)
    offset = cfg.bounds + cfg.cell_size
    c = B.cell_coords(pos, cfg.cell_size, cfg.grid_dim, offset)

    def kw(w, pwg=None):
        return dict(n=n, gsz=gsz, wg=w, prev_wg=pwg,
                    perception_sq=jnp.float32(cfg.perception_radius ** 2),
                    separation_sq=jnp.float32(cfg.separation_radius ** 2))

    code = (_spread3(c[0]) | (_spread3(c[1]) << 1) | (_spread3(c[2]) << 2))
    *_, nb1, grp = B._window_pass(pos, vel, col, None, code, **kw(wg))
    c2 = c + sh
    code2 = (_spread3(c2[0]) | (_spread3(c2[1]) << 1)
             | (_spread3(c2[2]) << 2))
    *_, nb2, _ = B._window_pass(pos, vel, col, grp, code2, **kw(wgb, wg))
    nb_one = np.asarray(nb1)
    nb_two = nb_one + np.asarray(nb2)

    rng = np.random.default_rng(0)
    idx = rng.choice(n, sample, replace=False)
    nbe = sampled_exact_counts(pos_np, idx, cfg.perception_radius)
    tot = max(int(nbe.sum()), 1)
    assert (nb_two[idx] <= nbe).all(), "double counting!"
    return nb_one[idx].sum() / tot, nb_two[idx].sum() / tot, tot


def main():
    rng = np.random.default_rng(7)
    n = 100_000
    cfg = BoidsConfig(num_boids=n)
    gd = cfg.grid_dim
    gsz, wg = cfg.group_size, cfg.window_groups
    sh = max(1, (gd * 3) // 7)

    uni = (rng.random((3, n)) - 0.5) * 2 * cfg.bounds
    s1, s2, tot = capture(uni, cfg, gsz, wg, sh, wg)
    print(f"uniform100k grid={gd} shift={sh} pairs~{tot}: "
          f"single={s1:.4f} two={s2:.4f}", flush=True)

    centers = (rng.random((3, 200)) - 0.5) * 2 * (cfg.bounds - 20)
    clu = (np.repeat(centers, n // 200, axis=1)
           + rng.normal(size=(3, n)) * 4.0)
    clu = clu.clip(-cfg.bounds, cfg.bounds)
    s1, s2, tot = capture(clu, cfg, gsz, wg, sh, wg)
    print(f"clustered100k pairs~{tot}: single={s1:.4f} two={s2:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
