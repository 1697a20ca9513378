"""Microbench: packed vs separate gathers/scatters on TPU.

Answers the round-3 rebuild question: the traversal pays ~14 separate
single-column gathers + ~13 single-column scatters per worklist slot.
If XLA's random-access cost is per-INDEX (cache line) rather than
per-element, packing the columns into one (R, C) array and gathering
(R, W) in one op is ~R x cheaper.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/gather_bench.py
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
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


def main():
    C = 1_000_000     # cells in the level
    W = 3_200_000     # worklist slots
    R = 16            # packed attribute rows
    key = jax.random.PRNGKey(0)
    cols = [jax.random.normal(jax.random.fold_in(key, i), (C,))
            for i in range(R)]
    packed = jnp.stack(cols)                       # (R, C)
    packed_t = packed.T                            # (C, R)
    idx = jax.random.randint(jax.random.fold_in(key, 99), (W,), 0, C)
    vals = jax.random.normal(jax.random.fold_in(key, 100), (R, W))

    @jax.jit
    def sep_gather(cols, idx):
        return [c[idx] for c in cols]

    @jax.jit
    def packed_gather(packed, idx):
        return packed[:, idx]                      # (R, W)

    @jax.jit
    def packed_gather_rows(packed_t, idx):
        return packed_t[idx]                       # (W, R)

    @jax.jit
    def one_gather(col, idx):
        return col[idx]

    @jax.jit
    def sep_scatter(cols, idx, vals):
        return [jnp.zeros((C,), jnp.float32).at[idx].set(v, mode="drop")
                for v in vals]

    @jax.jit
    def packed_scatter(idx, vals):
        return jnp.zeros((R, C), jnp.float32).at[:, idx].set(
            vals, mode="drop")

    @jax.jit
    def packed_scatter_rows(idx, vals):
        return jnp.zeros((C, R), jnp.float32).at[idx].set(
            vals.T, mode="drop")

    @jax.jit
    def sep_add(cols, idx, vals):
        return [jnp.zeros((C,), jnp.float32).at[idx].add(v, mode="drop")
                for v in vals]

    for name, fn, args in [
        ("one_gather (1 col, W idx)", one_gather, (cols[0], idx)),
        ("sep_gather (16 cols)", sep_gather, (cols, idx)),
        ("packed_gather (16,C)[:,idx]", packed_gather, (packed, idx)),
        ("packed_gather_rows (C,16)[idx]", packed_gather_rows,
         (packed_t, idx)),
        ("sep_scatter (16 cols)", sep_scatter, (cols, idx, vals)),
        ("packed_scatter (16,C).at[:,idx]", packed_scatter, (idx, vals)),
        ("packed_scatter_rows (C,16).at[idx]", packed_scatter_rows,
         (idx, vals)),
        ("sep_scatter_add (16 cols)", sep_add, (cols, idx, vals)),
    ]:
        try:
            t = timeit(fn, *args)
            per = t / W * 1e9
            print(f"{name:38s} {t*1e3:8.2f} ms   {per:6.2f} ns/slot",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:38s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
