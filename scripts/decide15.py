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


def bench_row_reads(n_cells, n_reads, reps_in_kernel, width=1):
    """Sum over n_reads random (1, 128) rows of a VMEM-resident table.

    ``width`` issues that many INDEPENDENT dynamic-sublane reads per
    loop iteration (distinct accumulators, so only the loop carries a
    dependence).  The serialized cost measured 142 ns/read — whether
    independent reads pipeline decides the traversal-kernel design
    (batched-frontier BFS vs serial DFS)."""
    tree = jnp.arange(n_cells * 128, dtype=jnp.float32).reshape(
        n_cells, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_cells, n_reads), jnp.int32)

    def kernel(idx_ref, tree_ref, out_ref):
        def rep(r, acc0):
            def body(i, accs):
                return tuple(
                    acc + tree_ref[pl.ds(idx_ref[i * width + w], 1), :]
                    for w, acc in enumerate(accs))
            return jax.lax.fori_loop(0, n_reads // width, body, acc0)
        accs = jax.lax.fori_loop(
            0, reps_in_kernel, rep,
            tuple(jnp.zeros((1, 128), jnp.float32)
                  for _ in range(width)))
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        out_ref[:, :] = out

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
    print(f"  row-read w{width}: cells={n_cells} reads={n_reads}x"
          f"{reps_in_kernel}: {t*1e3:.1f} ms total, {per:.1f} ns/read",
          flush=True)


def bench_block_read(n_cells, n_reads, reps_in_kernel):
    """(2, 128) two-row dynamic-sublane read (the straddle-safe run
    read): is it ~1 read or ~2?"""
    tree = jnp.arange(n_cells * 128, dtype=jnp.float32).reshape(
        n_cells, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_cells - 2, n_reads), jnp.int32)

    def kernel(idx_ref, tree_ref, out_ref):
        def rep(r, acc0):
            def body(i, acc):
                rows = tree_ref[pl.ds(idx_ref[i], 2), :]
                return acc + rows[0:1, :] + rows[1:2, :]
            return jax.lax.fori_loop(0, n_reads, body, acc0)
        out_ref[:, :] = jax.lax.fori_loop(
            0, reps_in_kernel, rep, jnp.zeros((1, 128), jnp.float32))

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
    print(f"  block-read (2,128): {t*1e3:.1f} ms, {per:.1f} ns/block",
          flush=True)


def bench_reduce_roundtrip(n_ops, reps_in_kernel, batch=1):
    """Vector reduce -> SMEM scalar -> control-flow round trip (the
    traversal kernel's decision-word path).  ``batch`` reductions are
    issued back-to-back (independent) before any scalar is consumed —
    measures whether the vector->scalar sync amortizes."""
    x = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)

    def kernel(idx_ref, x_ref, out_ref, smem):
        v = x_ref[:, :]

        def rep(r, acc0):
            def body(i, acc):
                for b in range(batch):
                    smem[0, b] = jnp.sum(v * (1.0 + acc * 1e-20)
                                         + jnp.float32(b))
                s = smem[0, 0]
                for b in range(1, batch):
                    s = s + smem[0, b]
                return acc + s
            return jax.lax.fori_loop(0, n_ops, body, acc0)
        out_ref[0, 0] = jax.lax.fori_loop(0, reps_in_kernel, rep,
                                          jnp.float32(0))

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((1, 128), lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1, 8), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
    g = jax.jit(lambda i, t: f(i, t))
    t = timeit(lambda: g(jnp.arange(4, dtype=jnp.int32), x))
    per = t / (n_ops * reps_in_kernel * batch) * 1e9
    print(f"  reduce-roundtrip b{batch}: {t*1e3:.1f} ms, "
          f"{per:.1f} ns/reduce", flush=True)


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


def probe_scalar_load_dynsub(n_cells=8192, n_reads=4096, reps=20):
    """Scalar VMEM load at (dynamic sublane, STATIC lane).  The dyn/dyn
    variant crashed Mosaic (decide17 stage 1, HTTP 500); if this form
    compiles the traversal kernel can keep scalar control flow with an
    8-lanes-per-cell unpacked table — at 128-lane row padding that is
    only viable for a table split by attribute."""
    tree = jnp.arange(n_cells * 128, dtype=jnp.float32).reshape(
        n_cells, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_cells, n_reads), jnp.int32)

    def kernel(idx_ref, tree_ref, out_ref):
        def rep(r, acc0):
            def body(i, acc):
                return acc + tree_ref[idx_ref[i], 5]
            return jax.lax.fori_loop(0, n_reads, body, acc0)
        out_ref[0, 0] = jax.lax.fori_loop(0, reps, rep, jnp.float32(0))

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((n_cells, 128),
                                   lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                                   memory_space=pltpu.SMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
    g = jax.jit(lambda i, t: f(i, t))
    t = timeit(lambda: g(idx, tree))
    per = t / (n_reads * reps) * 1e9
    print(f"  scalar load (dyn sub, static lane): OK {t*1e3:.1f} ms, "
          f"{per:.1f} ns/read", flush=True)


def probe_scalar_load_dyn_dyn_retry(n_cells=8192, n_reads=4096, reps=20):
    """Retry of decide17's dyn/dyn scalar load (its FAIL was an HTTP 500
    compile-helper crash — possibly transient infra)."""
    tree = jnp.arange(n_cells * 128, dtype=jnp.float32).reshape(
        n_cells, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_cells, n_reads), jnp.int32)

    def kernel(idx_ref, tree_ref, out_ref):
        def rep(r, acc0):
            def body(i, acc):
                c = idx_ref[i]
                return acc + tree_ref[c, (c * 7) % 128]
            return jax.lax.fori_loop(0, n_reads, body, acc0)
        out_ref[0, 0] = jax.lax.fori_loop(0, reps, rep, jnp.float32(0))

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((n_cells, 128),
                                   lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                                   memory_space=pltpu.SMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
    g = jax.jit(lambda i, t: f(i, t))
    t = timeit(lambda: g(idx, tree))
    per = t / (n_reads * reps) * 1e9
    print(f"  scalar load (dyn sub, dyn lane): OK {t*1e3:.1f} ms, "
          f"{per:.1f} ns/read", flush=True)


def bench_extract8(n_cells=8192, n_visits=4096, reps=10, use_roll=True):
    """The full DFS-visit extraction pattern for a 16-cells-per-row
    packed table WITHOUT scalar VMEM loads: dynamic-sublane row read,
    dynamic lane align (roll or one-hot), 8 reduce-to-SMEM scalars,
    scalar reads back into control flow.  ns/visit is THE number that
    decides the traversal kernel's viability (<~100 ns => rebuild
    ~0.6-1.1 s at 1M; the XLA path pays ~410 ns/slot)."""
    tree = jnp.arange(n_cells * 128, dtype=jnp.float32).reshape(
        n_cells, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_cells * 16, n_visits), jnp.int32)

    def kernel(idx_ref, tree_ref, out_ref, smem):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def rep(r, acc0):
            def body(i, acc):
                c = idx_ref[i]
                row = tree_ref[pl.ds(c // 16, 1), :]
                base = (c % 16) * 8
                if use_roll:
                    al = pltpu.roll(row, -base, 1)
                    for k in range(8):
                        smem[0, k] = jnp.sum(
                            jnp.where(lanes == k, al, 0.0))
                else:
                    for k in range(8):
                        smem[0, k] = jnp.sum(
                            jnp.where(lanes == base + k, row, 0.0))
                s = smem[0, 0]
                for k in range(1, 8):
                    s = s + smem[0, k]
                return acc + s
            return jax.lax.fori_loop(0, n_visits, body, acc0)
        out_ref[0, 0] = jax.lax.fori_loop(0, reps, rep, jnp.float32(0))

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((n_cells, 128),
                                   lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1, 8), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
    g = jax.jit(lambda i, t: f(i, t))
    t = timeit(lambda: g(idx, tree))
    per = t / (n_visits * reps) * 1e9
    print(f"  extract8 ({'roll' if use_roll else 'onehot'}): "
          f"{t*1e3:.1f} ms, {per:.1f} ns/visit", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for name, fn in [
            ("row-read w1 8K", lambda: bench_row_reads(8192, 4096, 50)),
            # 24K cells = 12.3 MB table: stays under the 16 MB scoped
            # vmem limit (32K cells = 16 MB aborted the whole script).
            ("row-read w1 24K",
             lambda: bench_row_reads(24576, 4096, 50)),
            ("row-read w2", lambda: bench_row_reads(8192, 4096, 50, 2)),
            ("row-read w4", lambda: bench_row_reads(8192, 4096, 50, 4)),
            ("row-read w8", lambda: bench_row_reads(8192, 4096, 25, 8)),
            ("block-read", lambda: bench_block_read(8192, 4096, 50)),
            ("row-write", lambda: bench_row_write(8192, 4096, 50)),
            ("roll", bench_roll),
            ("reduce-roundtrip b1",
             lambda: bench_reduce_roundtrip(4096, 50, 1)),
            ("reduce-roundtrip b4",
             lambda: bench_reduce_roundtrip(4096, 50, 4)),
            ("reduce-roundtrip b8",
             lambda: bench_reduce_roundtrip(4096, 25, 8)),
            ("scalar load (dyn sub, static lane)",
             probe_scalar_load_dynsub),
            ("scalar load (dyn sub, dyn lane) retry",
             probe_scalar_load_dyn_dyn_retry),
            ("extract8 roll", lambda: bench_extract8(use_roll=True)),
            ("extract8 onehot", lambda: bench_extract8(use_roll=False)),
    ]:
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
