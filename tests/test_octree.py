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
