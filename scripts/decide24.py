"""Price the emission primitives head-to-head at worklist width (round 5).

decide23 measured the compact emission SLOWER than the scatter path at
1M (4112 vs 3220 ms full rebuild) despite producing identical pools.
This script isolates where the time goes, at W=4M / 35% density /
ng=3907 / L=6144 (the 1M level-8 shape):

  a) flat i32 cumsum over W                (shared by both paths)
  b) 2-column scatter into (ng*L,)         (the old emit cost)
  c) segment_sum sorted W -> ng            (the old counts cost)
  d) _tile_compact method=sort             (new)
  e) _tile_compact method=matmul           (new)
  f) _tile_assemble cap=W                  (new)
  g) packed (2,T)[:, idx] gather at W      (assembly's descriptor read)

Chained-marginal timing per tpu rules (NOTES.md).
Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide24.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from spatialsim_tpu.ops.bh_window import (_tile_compact, _tile_assemble,
                                          _COMPACT_TILE)

W = 4_194_304
NG = 3_907
L = 6_144
DENS = 0.35


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


def marginal(make_chain, reps=3):
    t1 = timeit(make_chain(1), reps)
    t3 = timeit(make_chain(3), reps)
    return (t3 - t1) / 2, t1


def run_case(name, make_chain):
    try:
        tm, t1 = marginal(make_chain)
        print(f"  {name}: {tm*1e3:8.1f} ms (t1 {t1*1e3:.0f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
    jax.clear_caches()


def main():
    print(f"platform={jax.devices()[0].platform} W={W} dens={DENS}",
          flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mask = jax.random.uniform(k1, (W,)) < DENS
    cs = jax.random.randint(k2, (W,), 0, 1_000_000, jnp.int32)
    ce = cs + jax.random.randint(k3, (W,), 1, 64, jnp.int32)
    gidx = jnp.sort(jax.random.randint(k1, (W,), 0, NG, jnp.int32))
    flat = jnp.where(mask, jnp.clip(gidx, 0, NG - 1) * L
                     + (jnp.arange(W) % L), NG * L)

    def chain(body):
        # Carry = the cs payload so every iteration's op depends on the
        # previous one (no hoisting/CSE across the scan).
        def mk(k):
            @jax.jit
            def run(mask, cs, ce, flat, gidx):
                def step(c, _):
                    out = body(mask, c, ce, flat, gidx)
                    acc = jnp.float32(0)
                    for lf in jax.tree_util.tree_leaves(out):
                        acc += jnp.sum(lf.astype(jnp.float32)) * 1e-20
                    return c + (acc > 1e30).astype(jnp.int32), None
                c, _ = jax.lax.scan(step, cs, None, length=k)
                return c
            return lambda: run(mask, cs, ce, flat, gidx)
        return mk

    run_case("a) cumsum W i32", chain(
        lambda m, cs, ce, flat, g: jnp.cumsum(cs & 1)))
    run_case("b) 2-col scatter (ng*L)", chain(
        lambda m, cs, ce, flat, g: (
            jnp.zeros((NG * L + 1,), jnp.int32).at[flat].set(
                cs, mode="drop"),
            jnp.zeros((NG * L + 1,), jnp.int32).at[flat].set(
                ce, mode="drop"))))
    run_case("c) segment_sum W->ng", chain(
        lambda m, cs, ce, flat, g: jax.ops.segment_sum(
            cs & 1, g, num_segments=NG)))
    run_case("d) tile_compact sort", chain(
        lambda m, cs, ce, flat, g: _tile_compact(m, (cs, ce),
                                                 method="sort")))
    run_case("e) tile_compact matmul", chain(
        lambda m, cs, ce, flat, g: _tile_compact(m, (cs, ce),
                                                 method="matmul")))

    comp, tcnt = jax.jit(lambda m, cs, ce: _tile_compact(
        m, (cs, ce), method="sort"))(mask, cs, ce)

    def mk_asm(k):
        @jax.jit
        def run(tcnt, comp):
            def step(c, _):
                out, tot = _tile_assemble(c, comp, W)
                acc = jnp.sum(out.astype(jnp.float32)) * 1e-20
                return c + (acc > 1e30).astype(jnp.int32), None
            c, _ = jax.lax.scan(step, tcnt, None, length=k)
            return c
        return lambda: run(tcnt, comp)

    run_case("f) tile_assemble cap=W", mk_asm)

    T = W // _COMPACT_TILE
    tbl = jnp.stack([jnp.arange(T, dtype=jnp.int32),
                     jnp.arange(T, dtype=jnp.int32) * 2])
    seg = jnp.sort(jax.random.randint(k2, (W,), 0, T, jnp.int32))

    def mk_pg(k):
        @jax.jit
        def run(tbl, seg):
            def step(c, _):
                v = c[:, seg]
                return c + v[:, :1] * 0, None
            c, _ = jax.lax.scan(step, tbl, None, length=k)
            return c
        return lambda: run(tbl, seg)

    run_case("g) packed (2,T)[:,seg] gather W", mk_pg)
    print("done", flush=True)


if __name__ == "__main__":
    main()
