"""Distributed sample-sort vs the replicated global sort (SURVEY.md §4).

Property: the D-device sample-sort produces EXACTLY the global
Morton-sorted order, shard by shard, payloads included — or reports
ok=False (never silently wrong).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from spatialsim_tpu.parallel import make_mesh
from spatialsim_tpu.parallel.mesh import BODY_AXIS
from spatialsim_tpu.parallel.distsort import sample_sort_local

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _run(codes, rows_f, rows_i, D, **kw):
    mesh = make_mesh(D)
    fn = shard_map(
        functools.partial(sample_sort_local, axis=BODY_AXIS, ndev=D,
                          **kw),
        mesh=mesh,
        in_specs=(P(BODY_AXIS), P(None, BODY_AXIS), P(None, BODY_AXIS)),
        out_specs=(P(BODY_AXIS), P(None, BODY_AXIS), P(None, BODY_AXIS),
                   P()))
    sh = NamedSharding(mesh, P(BODY_AXIS))
    sh2 = NamedSharding(mesh, P(None, BODY_AXIS))
    return fn(jax.device_put(codes, sh), jax.device_put(rows_f, sh2),
              jax.device_put(rows_i, sh2))


@requires_8
@pytest.mark.parametrize("dist", ["uniform", "clustered"])
@pytest.mark.slow
def test_sample_sort_matches_global(dist):
    D, n = 8, 4096
    rng = np.random.default_rng(3)
    if dist == "uniform":
        codes = rng.integers(0, 1 << 30, n).astype(np.int32)
    else:
        # Heavy clustering: most codes in a narrow band (stress test
        # for splitter quality and the rebalance halo).
        codes = np.where(rng.random(n) < 0.8,
                         rng.integers(1000, 3000, n),
                         rng.integers(0, 1 << 30, n)).astype(np.int32)
    rows_f = rng.normal(size=(4, n)).astype(np.float32)
    rows_i = np.stack([np.arange(n, dtype=np.int32),
                       rng.integers(0, 99, n).astype(np.int32)])

    out_c, out_f, out_i, ok = _run(
        jnp.asarray(codes), jnp.asarray(rows_f), jnp.asarray(rows_i), D)
    assert bool(ok)

    # Oracle: stable global sort is not required — codes may repeat, so
    # compare codes exactly and payloads as multisets per code via the
    # unique original index carried in rows_i[0].
    o = np.argsort(codes, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_c), codes[o])
    perm = np.asarray(out_i[0])
    assert np.array_equal(np.sort(perm), np.arange(n))
    np.testing.assert_array_equal(codes[perm], codes[o])
    np.testing.assert_array_equal(np.asarray(out_f), rows_f[:, perm])
    np.testing.assert_array_equal(np.asarray(out_i[1]), rows_i[1][perm])


@requires_8
@pytest.mark.slow
def test_sample_sort_overflow_flag():
    # cap_factor far below 1 makes bins overflow: must report ok=False.
    D, n = 8, 4096
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 100, n).astype(np.int32))
    rows_f = jnp.zeros((1, n), jnp.float32)
    rows_i = jnp.zeros((1, n), jnp.int32)
    *_, ok = _run(codes, rows_f, rows_i, D, cap_factor=0.05)
    assert not bool(ok)
