"""Round-4 sweep #19: packed-gather layout disaster hypothesis.

The 20M EXTREME run died at compile with `Allocation (size=20.48 GB)
f32[40000000,6]{1,0:T(8,128)}` — a worklist-budget-sized gather
intermediate whose minor dim 6 PADS TO 128 LANES.  The "one packed
gather" pattern (`(k, n)[:, idx]`) lowers to gather -> [W, k] {1,0}
-> transpose, and if XLA materializes the padded intermediate, every
such gather moves 128/k times more HBM than the data — possibly THE
hidden term in the 410 ns/slot traversal cost (gather_bench's ~15 ns
claim was measured at small W where it stays fused).

This A/Bs, chained-marginal, at worklist scale (W = 4M, table 2M):
  (a) packed (k, n)[:, idx] -> (k, W)
  (b) k separate (n,)[idx] gathers
  (c) packed with the result CONSUMED without transpose (sum along k)
for k = 6 and k = 10.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide19.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, reps=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(k, n, w):
    rows = jnp.asarray(
        np.random.default_rng(0).random((k, n)), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, n, w), jnp.int32)

    def chain(body, reps):
        @jax.jit
        def f(idx):
            def step(c, _):
                out = body(c)
                return c + out[0][:1].astype(jnp.int32) % 2, None
            c, _ = jax.lax.scan(step, idx, None, length=reps)
            return c
        return f

    def packed(ix):
        g = rows[:, ix]                       # (k, W)
        return (jnp.sum(g, axis=0),)

    def separate(ix):
        acc = rows[0][ix]
        for r in range(1, k):
            acc = acc + rows[r][ix]
        return (acc,)

    def packed_cols(ix):
        # Gather against the TRANSPOSED table: (n, k)[idx, :] -> [W, k].
        g = rowsT[ix, :]
        return (jnp.sum(g, axis=1),)

    rowsT = rows.T
    for name, body in (("packed (k,n)[:,idx]", packed),
                       ("separate k gathers", separate),
                       ("packed rowsT[idx,:]", packed_cols)):
        try:
            c1 = chain(body, 1)
            c4 = chain(body, 4)
            t1 = timeit(lambda: c1(idx))
            t4 = timeit(lambda: c4(idx))
            per = (t4 - t1) / 3 / w * 1e9
            print(f"  k={k} W={w//1000000}M {name}: marginal "
                  f"{(t4-t1)/3*1e3:.1f} ms = {per:.1f} ns/slot",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  k={k} {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    bench(6, 2_000_000, 4_000_000)
    bench(10, 2_000_000, 4_000_000)
    bench(2, 2_000_000, 4_000_000)
    print("done", flush=True)


if __name__ == "__main__":
    main()
