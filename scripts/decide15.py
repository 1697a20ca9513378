"""Round-3 sweep #14: feasibility microbench for a Pallas traversal.

The rebuild wall (2.2-2.5 s at 1M) is gather/scatter bound in XLA.  A
Pallas traversal kernel needs two primitives to be cheap:
  (a) dynamic-SUBLANE row reads from a VMEM tree at random cell ids
      (vector gather does not exist on TPU; XLA pays ~15 ns/index),
  (b) ideally a dynamic lane rotate (pltpu.roll) so 8 cells can share
      one 112-lane row (the 14-attr rows pad to 128 lanes; unpacked,
      a 1M tree would need 64 MB against ~16 MB VMEM).
This measures (a) at several batch sizes and probes (b)'s existence.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, reps=5):
    out = fn()
    np.asarray(out.ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_row_reads(n_cells, n_reads, reps_in_kernel):
    """Sum over n_reads random (1, 128) rows of a VMEM-resident table."""
    tree = jnp.arange(n_cells * 128, dtype=jnp.float32).reshape(
        n_cells, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_cells, n_reads), jnp.int32)

    def kernel(idx_ref, tree_ref, out_ref):
        def rep(r, acc0):
            def body(i, acc):
                c = idx_ref[i]
                row = tree_ref[pl.ds(c, 1), :]
                return acc + row
            return jax.lax.fori_loop(0, n_reads, body, acc0)
        acc = jax.lax.fori_loop(
            0, reps_in_kernel, rep, jnp.zeros((1, 128), jnp.float32))
        out_ref[:, :] = acc

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((n_cells, 128),
                                   lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )
    g = jax.jit(lambda i, t: f(i, t))
    t = timeit(lambda: g(idx, tree))
    per = t / (n_reads * reps_in_kernel) * 1e9
    print(f"  row-read: cells={n_cells} reads={n_reads}x"
          f"{reps_in_kernel}: {t*1e3:.1f} ms total, {per:.1f} ns/read",
          flush=True)


def bench_row_write(n_cells, n_ops, reps_in_kernel):
    """Random row read + write to a second table (the append pattern)."""
    tree = jnp.ones((n_cells, 128), jnp.float32)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_cells, n_ops), jnp.int32)

    def kernel(idx_ref, tree_ref, out_ref, scr):
        def rep(r, _):
            def body(i, _):
                c = idx_ref[i]
                row = tree_ref[pl.ds(c, 1), :]
                scr[pl.ds(c, 1), :] = row * 2.0
                return 0
            return jax.lax.fori_loop(0, n_ops, body, 0)
        jax.lax.fori_loop(0, reps_in_kernel, rep, 0)
        out_ref[:, :] = scr[0:1, :]

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((n_cells, 128),
                                   lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_cells, 128), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )
    g = jax.jit(lambda i, t: f(i, t))
    t = timeit(lambda: g(idx, tree))
    per = t / (n_ops * reps_in_kernel) * 1e9
    print(f"  row-read+write: {t*1e3:.1f} ms, {per:.1f} ns/op",
          flush=True)


def bench_roll():
    """Probe dynamic pltpu.roll (lane rotate by a traced amount)."""
    x = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)

    def kernel(x_ref, s_ref, out_ref):
        amt = s_ref[0, 0]
        out_ref[:, :] = pltpu.roll(x_ref[:, :], amt, 1)

    try:
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((1, 128), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, 128), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        )
        out = jax.jit(f)(x, jnp.array([[5]], jnp.int32))
        ok = np.asarray(out)[0, 0]
        print(f"  dynamic roll: OK (out[0]={ok})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  dynamic roll: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    bench_row_reads(8192, 4096, 50)
    bench_row_reads(32768, 4096, 50)
    bench_row_write(8192, 4096, 50)
    bench_roll()
    print("done", flush=True)


if __name__ == "__main__":
    main()
