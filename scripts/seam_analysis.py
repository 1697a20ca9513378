"""How much far-list work is Morton-seam overhead?

For each group: distance of each far entry to the group centre, in units
of the group's own bounding radius.  Entries at < ~3 group radii are
spatially-near mass that the contiguous Morton window failed to cover
(seam neighbours opened to depth) — the candidate payload for a
neighbour-group near list.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python \
           scripts/seam_analysis.py [n]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
from spatialsim_tpu import distributions
from spatialsim_tpu.ops.bh_window import build_lists, _build_kw


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    cfg = resolve_config(NBodyConfig(
        num_bodies=n, theta=0.8, softening=2.0, spawn_radius=500.0,
        engine="window"), n)
    p, v, m = distributions.generate_distribution(
        "galaxy", n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)

    lists = build_lists(pos, vel, mass, **{**_build_kw(cfg), "pool_tile": 0})
    gsz = cfg.group_size
    npad = lists.order.shape[0]
    ng = npad // gsz
    s_pos = np.asarray(pos[:, lists.order])          # (3, npad)
    gpos = s_pos.reshape(3, ng, gsz)
    center = gpos.mean(axis=2)                        # (3, ng)
    radius = np.linalg.norm(
        gpos - center[:, :, None], axis=0).max(axis=1)  # (ng,)

    far = np.asarray(lists.far)                       # (ng, R, L)
    far_n = np.asarray(lists.far_n)
    L = far.shape[2]
    k = np.arange(L)[None, :]
    valid = k < far_n[:, None]
    d = np.linalg.norm(far[:, 0:3, :] - center.T[:, :, None], axis=1)
    r = np.maximum(radius, 1e-6)[:, None]
    ratio = np.where(valid, d / r, np.inf)

    total = valid.sum()
    print(f"n={n:,} ng={ng} far entries total={total:,} "
          f"mean/group={total / ng:.0f}")
    for thr in (1.5, 2.0, 3.0, 5.0, 10.0):
        frac = (ratio < thr).sum() / total
        print(f"  entries within {thr:4.1f} group radii: {frac * 100:5.1f}%")
    # Mass-weighted view (heavy near entries matter more for error).
    mass_e = np.where(valid, far[:, 6, :], 0.0)
    for thr in (2.0, 3.0):
        frac = mass_e[ratio < thr].sum() / mass_e.sum()
        print(f"  far MASS within {thr:4.1f} group radii: {frac * 100:5.1f}%")


if __name__ == "__main__":
    main()
