"""Octree invariants + Morton round-trip.

The reference has no tests; these check the invariants its insert loop
maintains implicitly (every body in exactly one leaf, node mass = sum of
child masses, COM consistency — reference ``nbody/simulation.py:160-167``).
"""

import jax.numpy as jnp
import numpy as np

from spatialsim_tpu.ops.bounds import compute_bounds
from spatialsim_tpu.ops.morton import morton_encode, cell_center
from spatialsim_tpu.ops.octree import SENTINEL, build_octree


def _tree_from(pos, mass, depth=6, start=2):
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    half = compute_bounds(pos)
    codes = morton_encode(pos, half, depth)
    order = jnp.argsort(codes)
    return build_octree(codes[order], pos[:, order], mass[order], half,
                        max_depth=depth, start_level=start), half


def test_morton_sorted_cells_are_contiguous(rng):
    pos = jnp.asarray(rng.normal(size=(3, 500)) * 100, jnp.float32)
    half = compute_bounds(pos)
    codes = np.sort(np.asarray(morton_encode(pos, half, 6)))
    # Every cell id at every level is one contiguous run once sorted.
    for shift in (0, 3, 6, 9):
        c = codes >> shift
        changes = np.flatnonzero(np.diff(c))
        assert len(np.unique(c)) == len(changes) + 1


def test_morton_center_within_cell():
    pos = jnp.asarray(np.array([[120.0, -3.0], [5.0, 44.0], [-80.0, 0.1]]),
                      jnp.float32)
    half = compute_bounds(pos)
    depth = 6
    codes = morton_encode(pos, half, depth)
    side = 2 * float(half) / (2 ** depth)
    centers = np.asarray(cell_center(codes, depth, depth, half))
    assert np.all(np.abs(centers - np.asarray(pos)) <= side / 2 + 1e-4)


def test_octree_mass_and_count_invariants(rng):
    n = 1000
    pos = rng.normal(size=(3, n)) * 200
    mass = rng.uniform(0.5, 2.0, n)
    tree, _ = _tree_from(pos, mass)
    total = float(np.sum(mass))
    for lv in tree.levels:
        m = np.asarray(lv.mass)
        c = np.asarray(lv.count)
        code = np.asarray(lv.code)
        ncell = int(lv.n_cells)
        # Occupied slots are a prefix; empties carry the sentinel.
        assert np.all(code[:ncell] != SENTINEL)
        assert np.all(code[ncell:] == SENTINEL)
        # Codes strictly increasing over occupied slots (compacted, sorted).
        assert np.all(np.diff(code[:ncell].astype(np.int64)) > 0)
        # Every body in exactly one cell per level; mass conserved.
        assert int(c.sum()) == n
        np.testing.assert_allclose(m.sum(), total, rtol=1e-5)


def test_octree_parent_child_links(rng):
    n = 600
    pos = rng.normal(size=(3, n)) * 150
    mass = np.ones(n)
    tree, _ = _tree_from(pos, mass)
    for parent, child in zip(tree.levels[:-1], tree.levels[1:]):
        pn = int(parent.n_cells)
        p = {k: np.asarray(v) for k, v in parent._asdict().items()}
        c = {k: np.asarray(v) for k, v in child._asdict().items()}
        for ci in range(pn):
            s = int(p["child_start"][ci])
            k = int(p["child_count"][ci])
            assert 1 <= k <= 8
            # Children's codes shift down to the parent's code.
            ccodes = c["code"][s:s + k].astype(np.int64)
            assert np.all(ccodes >> 3 == int(p["code"][ci]))
            # Mass/count pooled from exactly these children.
            np.testing.assert_allclose(
                p["mass"][ci], np.sum(c["mass"][s:s + k]), rtol=1e-5)
            assert p["count"][ci] == np.sum(c["count"][s:s + k])


def test_octree_com_matches_direct_average(rng):
    n = 400
    pos = rng.normal(size=(3, n)) * 100
    mass = rng.uniform(0.1, 3.0, n)
    tree, half = _tree_from(pos, mass, depth=5, start=2)
    pos = np.asarray(pos, np.float32)
    codes = np.asarray(morton_encode(jnp.asarray(pos), half, 5))
    lv = tree.levels[0]  # coarsest: level 2
    shift = 3 * (5 - 2)
    cell_of_body = codes >> shift
    lv_code = np.asarray(lv.code)
    lv_com = np.asarray(lv.com)
    for ci in range(int(lv.n_cells)):
        sel = cell_of_body == lv_code[ci]
        com = (pos[:, sel] * mass[sel]).sum(axis=1) / mass[sel].sum()
        np.testing.assert_allclose(lv_com[:, ci], com, rtol=1e-4, atol=1e-3)


def test_tight_level_caps_bitexact_when_fitting():
    """Occupancy-tight level caps change nothing while cells fit."""
    import jax.numpy as jnp
    import numpy as np
    from spatialsim_tpu import distributions
    from spatialsim_tpu.ops.bh_window import build_lists, _measure_tree_caps
    from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
    n = 20000
    p, v, m = distributions.generate_distribution("galaxy", n, 200.0, 0.1,
                                                  seed=3)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    cfg = resolve_config(NBodyConfig(theta=0.8, softening=2.0), n)
    caps = _measure_tree_caps(cfg.replace(max_depth=7, group_size=256),
                              pos)
    kw = dict(theta=0.8, softening=2.0, skin=2.0, max_depth=7,
              group_size=256, window_groups=2, list_cap=2048,
              pool_tile=512, with_ranges=True)
    ref = build_lists(pos, vel, mass, **kw)
    got = build_lists(pos, vel, mass, tree_caps=caps, **kw)
    np.testing.assert_array_equal(np.asarray(ref.far_n),
                                  np.asarray(got.far_n))
    np.testing.assert_array_equal(np.asarray(ref.pool),
                                  np.asarray(got.pool))


def test_level_cap_overflow_degrades_gracefully():
    """Caps BELOW occupancy: coarse emissions, mass conserved, no UB."""
    import jax.numpy as jnp
    import numpy as np
    from spatialsim_tpu import distributions
    from spatialsim_tpu.ops.bh_window import build_lists
    n = 20000
    p, v, m = distributions.generate_distribution("uniform", n, 200.0,
                                                  0.1, seed=4)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    kw = dict(theta=0.8, softening=2.0, skin=2.0, max_depth=7,
              group_size=256, window_groups=2, list_cap=2048,
              pool_tile=512, with_ranges=True)
    ref = build_lists(pos, vel, mass, **kw)
    # Deliberately too small: uniform 20K occupies far more than 2048
    # cells at depth 6-7.
    got = build_lists(pos, vel, mass,
                      tree_caps=(64, 512, 2048, 2048, 2048, 2048), **kw)
    pool = np.asarray(got.pool)
    assert np.isfinite(pool).all()
    # Whole-tree mass: sum over every group of its far mass + window
    # coverage is config-dependent, so check per-group far mass against
    # the reference build: coarse folds may REDISTRIBUTE mass between
    # entries but each group's far field must still see (almost) the
    # same total mass.
    def far_mass(lists):
        ps = np.asarray(lists.pstart)
        fn = np.asarray(lists.far_n)
        pl = np.asarray(lists.pool)
        tile = pl.shape[2]
        out = np.zeros(len(fn))
        for g in range(len(fn)):
            t0 = ps[g]
            nt = max(0, -(-fn[g] // tile))
            out[g] = pl[t0:t0 + nt, 6, :].sum()
        return out
    mr, mg = far_mass(ref), far_mass(got)
    np.testing.assert_allclose(mg, mr, rtol=5e-3, atol=1e-2)
