"""Round-4 sweep: traversal-kernel feasibility + emission-mode A/B.

Usage: PYTHONPATH=/root/repo python scripts/decide17.py [N]

Stage 1 — compile probes at tiny shapes (seconds): does Mosaic accept
the traversal kernel's primitives?
  (a) scalar VMEM load at (dynamic row, dynamic lane),
  (b) scalar VMEM store at (static sublane, dynamic lane),
  (c) lax.while_loop with SMEM-stack side effects,
  (d) the full bh_traverse_kernel at 64K bodies (compile + correctness
      vs the XLA ranges traversal).

Stage 2 — rebuild A/B at N (default 1M), chained-marginal timing
(per tpu-platform rules: single-dispatch numbers carry a 25-36 ms
floor):
  build_lists emit_mode values | ranges | kernel, and pooled variants.

Decisions this gates:
  * traversal_emit default ("values" vs "ranges" vs "kernel"),
  * NBodyConfig.pool_tile (with decide14),
  * whether the round-4 >=20 steps/s path is live.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def probe(name, fn):
    try:
        out = fn()
        print(f"  {name}: OK {out}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return False


def probe_scalar_load_dyn_dyn():
    tbl = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)

    def kernel(idx_ref, tbl_ref, out_ref):
        def body(i, acc):
            r = idx_ref[i]
            lane = (r * 7) % 128
            return acc + tbl_ref[r % 64, lane]
        out_ref[0, 0] = jax.lax.fori_loop(0, 128, body, jnp.float32(0))

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((64, 128),
                                   lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                                   memory_space=pltpu.SMEM)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))
    idx = jnp.arange(128, dtype=jnp.int32)
    return float(np.asarray(jax.jit(f)(idx, tbl))[0, 0])


def probe_scalar_store_dyn_lane():
    def kernel(idx_ref, out_ref):
        out_ref[:, :] = jnp.zeros_like(out_ref)

        def body(i, e):
            @pl.when(i % 3 == 0)
            def _():
                out_ref[0, e] = jnp.float32(i)
            return e + jnp.where(i % 3 == 0, 1, 0)
        jax.lax.fori_loop(0, 128, body, jnp.int32(0))

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[],
            out_specs=pl.BlockSpec((8, 256), lambda g, *_: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32))
    out = np.asarray(jax.jit(f)(jnp.arange(4, dtype=jnp.int32)))
    return float(out[0, :8].sum())


def probe_while_smem_stack():
    def kernel(idx_ref, out_ref, stack):
        stack[0, 0] = 0
        stack[0, 1] = 40

        def cond(st):
            sp, acc = st
            return sp >= 0

        def body(st):
            sp, acc = st
            s = stack[sp, 0]
            t = stack[sp, 1]
            more = s + 1 < t

            @pl.when(more)
            def _():
                stack[sp, 0] = s + 1
            sp = jnp.where(more, sp, sp - 1)
            push = (s % 17 == 3) & (sp < 6)
            spn = jnp.where(push, sp + 1, sp)

            @pl.when(push)
            def _():
                stack[spn, 0] = s * 2
                stack[spn, 1] = s * 2 + 2
            return spn, acc + s
        _, acc = jax.lax.while_loop(cond, body,
                                    (jnp.int32(0), jnp.int32(0)))
        out_ref[0, 0] = acc

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[],
            out_specs=pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((8, 2), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))
    return int(np.asarray(jax.jit(f)(jnp.arange(4, dtype=jnp.int32)))[0, 0])


def full_kernel_correctness(n=65536):
    from spatialsim_tpu.ops import bh_window as bw
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(0, 120, (3, n)).astype(np.float32))
    vel = jnp.asarray(rng.normal(0, 2, (3, n)).astype(np.float32))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, (n,)).astype(np.float32))
    acc = jnp.zeros_like(pos)
    kw = dict(theta=0.8, softening=2.0, skin=2.0, max_depth=8,
              group_size=256, window_groups=2, list_cap=4096)
    lr = bw.build_lists(pos, vel, mass, acc, emit_mode="ranges", **kw)
    lk = bw.build_lists(pos, vel, mass, acc, emit_mode="kernel", **kw)
    fnr = np.asarray(lr.far_n)
    fnk = np.asarray(lk.far_n)
    rr, rk = np.asarray(lr.far_range), np.asarray(lk.far_range)
    bad = 0
    for g in range(fnr.shape[0]):
        a = {tuple(x) for x in rr[g, :, :fnr[g]].T.tolist()
             if x[1] > x[0]}
        b = {tuple(x) for x in rk[g, :, :fnk[g]].T.tolist()}
        bad += a != b
    return f"range-set mismatch groups: {bad}/{fnr.shape[0]}"


def rebuild_ab(n):
    from spatialsim_tpu.ops import bh_window as bw
    from spatialsim_tpu import distributions
    p, v, m = distributions.generate_distribution("galaxy", n, 500.0,
                                                  0.1, seed=1)
    pos = jnp.asarray(p.T, jnp.float32)
    vel = jnp.asarray(v.T, jnp.float32)
    mass = jnp.asarray(m, jnp.float32)
    acc = jnp.zeros_like(pos)
    kw = dict(theta=0.8, softening=2.0, skin=2.0, max_depth=8,
              group_size=256, window_groups=2, list_cap=6144)

    variants = [("values", dict(emit_mode="values")),
                ("ranges", dict(emit_mode="ranges")),
                ("kernel", dict(emit_mode="kernel")),
                ("kernel-strict", dict(emit_mode="kernel-strict")),
                ("ranges+pool", dict(emit_mode="ranges", pool_tile=512)),
                ("kernel+pool", dict(emit_mode="kernel", pool_tile=512)),
                ("kstrict+pool", dict(emit_mode="kernel-strict",
                                      pool_tile=512))]
    for name, extra in variants:
        try:
            # Chain 3 builds with a data dependence through pos to get a
            # marginal per-build time (single dispatch carries the
            # 25-36 ms tunnel floor).
            def chain(pos, k):
                def body(c, _):
                    ls = bw.build_lists(c, vel, mass, acc, **kw, **extra)
                    probe_arr = (ls.pool[0, 6, :1] if ls.pool is not None
                                 else ls.far[0, 6, :1])
                    return c + 1e-20 * probe_arr[0], None
                out, _ = jax.lax.scan(body, pos, None, length=k)
                return out
            c1 = jax.jit(lambda p: chain(p, 1))
            c3 = jax.jit(lambda p: chain(p, 3))
            t1 = timeit(lambda: c1(pos))
            t3 = timeit(lambda: c3(pos))
            print(f"  build[{name}] marginal: "
                  f"{(t3 - t1) / 2 * 1e3:.0f} ms  (t1 {t1*1e3:.0f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  build[{name}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    print(f"platform={jax.devices()[0].platform}", flush=True)
    print("stage 1: compile probes", flush=True)
    ok = True
    ok &= probe("scalar load (dyn row, dyn lane)",
                probe_scalar_load_dyn_dyn)
    ok &= probe("scalar store (static sub, dyn lane)",
                probe_scalar_store_dyn_lane)
    ok &= probe("while_loop + SMEM stack", probe_while_smem_stack)
    probe("full kernel @64K", full_kernel_correctness)
    print(f"stage 2: rebuild A/B at {n}", flush=True)
    rebuild_ab(n)
    print("done", flush=True)


if __name__ == "__main__":
    main()
