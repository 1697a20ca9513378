"""Round-4 sweep #18: probes for the traversal-kernel v4 options.

The v3 kernel's modeled cost is dominated by (a) the per-iteration
decision-word reduce round-trip (274 ns solo) and (b) per-OPEN-cell
when-gated packed-extraction reduces.  Two escape hatches need data:

1. **SMEM child table**: (child_start*16 + child_count) for every
   non-leaf cell as an int32 SMEM scratch (~190 KB at 1M bodies,
   levels 0..6) would turn each push into a ~ns dynamic SMEM scalar
   read.  Needs: max SMEM scratch size that compiles, and the dynamic
   SMEM read cost at that size.
2. **Gated vs ungated reduces**: whether a pl.when-gated reduce pays
   the full 274 ns serialization or overlaps.

Plus: pure dynamic-sublane row STORE cost (the register-append flush),
and a two-run batched iteration shape A/B.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide18.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, reps=5):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe_smem_capacity(n_i32):
    """Does an (n_i32,)-int32 SMEM scratch compile, and what does a
    dynamic-index scalar read chain cost?"""
    n_ops, reps = 4096, 20

    def kernel(idx_ref, out_ref, tbl):
        def init(i, _):
            tbl[0, i * 997 % n_i32] = i
            return 0
        jax.lax.fori_loop(0, 256, init, 0)

        def rep(r, acc0):
            def body(i, acc):
                k = (idx_ref[i % 4] + i * 1009 + acc % 7) % n_i32
                return acc + tbl[0, k]
            return jax.lax.fori_loop(0, n_ops, body, acc0)
        out_ref[0, 0] = jax.lax.fori_loop(0, reps, rep, jnp.int32(0))

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[],
            out_specs=pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1, n_i32), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))
    g = jax.jit(lambda i: f(i))
    t = timeit(lambda: g(jnp.arange(4, dtype=jnp.int32)))
    per = t / (n_ops * reps) * 1e9
    print(f"  smem scratch {n_i32 * 4 // 1024} KB: OK, dyn scalar read "
          f"{per:.1f} ns", flush=True)


def probe_gated_reduce(gate_frac_pct):
    """pl.when-gated reduce round-trip (the push-extraction pattern):
    cost per ITERATION at a given gate hit rate."""
    n_ops, reps = 4096, 20
    x = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)

    def kernel(idx_ref, x_ref, out_ref, smem, stk):
        v = x_ref[:, :]

        def rep(r, acc0):
            def body(i, acc):
                smem[0, 0] = jnp.sum(v + acc * 1e-20)
                w = smem[0, 0].astype(jnp.int32)
                hit = (w + i) % 100 < gate_frac_pct

                @pl.when(hit)
                def _():
                    smem[0, 1] = jnp.sum(v * 2.0 + acc * 1e-20)
                    stk[0, 0] = smem[0, 1].astype(jnp.int32)
                return acc + w + jnp.where(hit, stk[0, 0], 0)
            return jax.lax.fori_loop(0, n_ops, body, acc0)
        out_ref[0, 0] = jax.lax.fori_loop(0, reps, rep, jnp.int32(0))

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((1, 128), lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1, 8), jnp.float32),
                            pltpu.SMEM((1, 8), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))
    g = jax.jit(lambda i, t: f(i, t))
    t = timeit(lambda: g(jnp.arange(4, dtype=jnp.int32), x))
    per = t / (n_ops * reps) * 1e9
    print(f"  word-reduce + {gate_frac_pct}%-gated second reduce: "
          f"{per:.1f} ns/iter", flush=True)


def probe_row_store(n_cells):
    """Pure dynamic-sublane row STORE (the register-append flush)."""
    n_ops, reps = 4096, 20
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_cells, n_ops), jnp.int32)

    def kernel(idx_ref, out_ref, scr):
        row = jax.lax.broadcasted_iota(
            jnp.int32, (1, 128), 1).astype(jnp.float32)

        def rep(r, _):
            def body(i, _):
                scr[pl.ds(idx_ref[i], 1), :] = row + i
                return 0
            return jax.lax.fori_loop(0, n_ops, body, 0)
        jax.lax.fori_loop(0, reps, rep, 0)
        out_ref[:, :] = scr[0:1, :]

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[],
            out_specs=pl.BlockSpec((1, 128), lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_cells, 128), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32))
    g = jax.jit(lambda i: f(i))
    t = timeit(lambda: g(idx))
    per = t / (n_ops * reps) * 1e9
    print(f"  row-store: {per:.1f} ns/store", flush=True)


def probe_iteration_shapes(k_runs):
    """The v3 iteration core, batched over k_runs: k dynamic (2,128)
    reads + dynamic aligns + ~40 vector ops each + k back-to-back word
    reduces + scalar decode.  ns per run decides the batching win."""
    n_iters, reps = 2048, 10
    n_cells = 8192
    tree = jnp.arange(n_cells * 128, dtype=jnp.float32).reshape(
        n_cells, 128) * 1e-6
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n_cells - 2, n_iters * k_runs),
                      jnp.int32)

    def kernel(idx_ref, tree_ref, out_ref, smem):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        lmod = lanes % 8
        lcell = lanes // 8
        cell_ok = (lmod == 0) & (lcell < 8)
        w_emit = jnp.where(cell_ok, 1 << (2 * lcell), 0).astype(
            jnp.float32)

        def rep(r, acc0):
            def body(i, acc):
                acc_out = acc
                for q in range(k_runs):
                    s = idx_ref[i * k_runs + q] + (acc % 3)
                    row = s // 16
                    base8 = (s % 16) * 8
                    blk = tree_ref[pl.ds(row % (n_cells - 2), 2), :]
                    amt = (128 - base8) % 128
                    a0 = pltpu.roll(blk[0:1, :], amt, 1)
                    a1 = pltpu.roll(blk[1:2, :], amt, 1)
                    al = jnp.where(lanes < 128 - base8, a0, a1)
                    bsv = pltpu.roll(al, 126, 1)
                    bev = pltpu.roll(al, 125, 1)
                    cxv = pltpu.roll(al, 124, 1)
                    gx = jnp.maximum(1.0 - cxv, cxv - 2.0)
                    dmin = gx * gx + 1.0
                    accept = (al < 0.64 * dmin) | (bev - bsv <= 1.0)
                    live = bev > bsv
                    em = live & accept & (bsv > 100.0)
                    dec = jnp.where(em, 1.0, 0.0)
                    smem[0, q] = jnp.sum(dec * w_emit)
                for q in range(k_runs):
                    acc_out = acc_out + smem[0, q].astype(jnp.int32) % 5
                return acc_out
            return jax.lax.fori_loop(0, n_iters, body, acc0)
        out_ref[0, 0] = jax.lax.fori_loop(0, reps, rep, jnp.int32(0))

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((n_cells, 128), lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1, 8), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))
    g = jax.jit(lambda i, t: f(i, t))
    t = timeit(lambda: g(idx, tree))
    per = t / (n_iters * reps * k_runs) * 1e9
    print(f"  iteration-core k{k_runs}: {per:.1f} ns/run", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for name, fn in [
            ("smem 32KB", lambda: probe_smem_capacity(8192)),
            ("smem 128KB", lambda: probe_smem_capacity(32768)),
            ("smem 256KB", lambda: probe_smem_capacity(65536)),
            ("smem 512KB", lambda: probe_smem_capacity(131072)),
            ("gated 0%", lambda: probe_gated_reduce(0)),
            ("gated 15%", lambda: probe_gated_reduce(15)),
            ("gated 100%", lambda: probe_gated_reduce(100)),
            ("row-store", lambda: probe_row_store(8192)),
            ("iter-core k1", lambda: probe_iteration_shapes(1)),
            ("iter-core k2", lambda: probe_iteration_shapes(2)),
            ("iter-core k4", lambda: probe_iteration_shapes(4)),
    ]:
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
