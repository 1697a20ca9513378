"""Dense level-synchronous traversal: primitive cost microbench (round 5).

The worklist traversal costs ~670 ns/slot at HEAD (prof_parts r5:
2808 ms over ~4.2M static slots) because every slot pays per-INDEX
gather/scatter tax.  The dense alternative tests EVERY (occupied cell,
group) pair of a level with elementwise ops in a (cells, groups) layout:
no per-slot gathers at all; parent propagation is a ROW gather (full
lane-width slices — DMA, not per-element); compaction is hierarchical
block ranks + one scatter over the ~4.2M EMITTED entries only.

This script prices each primitive at the 1M-galaxy level-8 shape
(C=262144 occupied-cell cap x G=3907 groups) so the dense design can be
costed before it is built:

  1. fused acceptance pass     -> int8 mask (C, G)
  2. parent-row gather         int8 (Cp, G)[ptr] -> (C, G)
  3. intra-block rank          cumsum vs matmul, block 256
  4. block-base cumsum         (C/256, G) int32 axis 0
  5. emitted-entry scatter     4.2M updates into (ng*L,) int32 x2
  6. pool-fill packed gather   (14, ngL)[:, idx] at 6.5M indices

Chained-marginal timing per tpu rules (NOTES.md): (t3 - t1)/2.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/decide22.py
"""

import sys
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


def marginal(make_chain, reps=3):
    t1 = timeit(make_chain(1), reps)
    t3 = timeit(make_chain(3), reps)
    return (t3 - t1) / 2, t1


C = 262_144          # level-8 occupied-cell capacity at 1M (occ ~169K)
CP = 65_536          # level-7 capacity (occ ~37K)
G = 3_907            # groups at 1M / 256
L = 6_144            # far-list cap
NG_L = G * L
B = 256              # rank block
EMIT = 4_200_000     # emitted entries (~measured far total)


def main():
    print(f"platform={jax.devices()[0].platform} C={C} G={G} B={B}",
          flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # Cell attrs: com (3, C), side scalar, range (2, C); group bounds (6, G)
    ccom = jax.random.normal(k1, (3, C), jnp.float32) * 500.0
    crng = jnp.stack([jnp.arange(C, dtype=jnp.int32) * 4,
                      jnp.arange(C, dtype=jnp.int32) * 4 + 4])
    gb = jax.random.normal(k2, (6, G), jnp.float32) * 500.0
    iv = jnp.stack([jnp.arange(G, dtype=jnp.int32) * 256,
                    jnp.arange(G, dtype=jnp.int32) * 256 + 1280])
    parent_open = (jax.random.uniform(k3, (CP, G)) < 0.05).astype(jnp.int8)
    ptr = jnp.sort(jax.random.randint(k4, (C,), 0, CP, jnp.int32))

    # --- 1. fused acceptance pass -> emit mask int8 (C, G) ---
    def chain_accept(k):
        @jax.jit
        def run(ccom, gb):
            def body(c, _):
                # Per-axis 2D expressions ONLY: a (3, C, G) broadcast
                # materializes 11.6 GB instead of fusing (measured OOM,
                # decide22 first run) — keep every temp rank-2.
                d2 = jnp.full((C, G), 4.0, jnp.float32)
                for ax in range(3):
                    gap = jnp.maximum(
                        jnp.maximum(gb[ax][None, :] - c[ax][:, None],
                                    c[ax][:, None] - gb[3 + ax][None, :]),
                        0.0)
                    d2 = d2 + gap * gap
                cs, ce = crng[0][:, None], crng[1][:, None]
                lo, hi = iv[0][None, :], iv[1][None, :]
                in_u = (cs >= lo) & (ce <= hi)
                ov = (cs < hi) & (ce > lo)
                outside = ~in_u & ~ov
                ok = (4.3 * 4.3 < 0.64 * d2)
                emit = (outside & ok).astype(jnp.int8)
                return c + 1e-20 * emit[0, 0].astype(jnp.float32), emit
            c, emits = jax.lax.scan(body, ccom, None, length=k)
            return c, emits[-1]
        return lambda: run(ccom, gb)

    tm, t1 = marginal(chain_accept)
    print(f"  accept pass (C,G): {tm*1e3:7.1f} ms  (t1 {t1*1e3:.0f})",
          flush=True)
    emit = chain_accept(1)()[1]

    # --- 2. parent-row gather int8 ---
    def chain_rowgather(k):
        @jax.jit
        def run(po, ptr):
            def body(p, _):
                out = p[ptr]          # (C, G) from (CP, G)
                return p + out[0, :1].astype(jnp.int8), out
            p, outs = jax.lax.scan(body, po, None, length=k)
            return p, outs[-1]
        return lambda: run(parent_open, ptr)

    tm, t1 = marginal(chain_rowgather)
    print(f"  parent row-gather (CP,G)[ptr]: {tm*1e3:7.1f} ms "
          f"(t1 {t1*1e3:.0f})", flush=True)

    # --- 3a. intra-block rank via cumsum ---
    def chain_rank_cumsum(k):
        @jax.jit
        def run(emit):
            def body(e, _):
                r = jnp.cumsum(
                    e.reshape(C // B, B, G).astype(jnp.int32), axis=1)
                return e + r[0, 0, :1].astype(jnp.int8), r
            e, rs = jax.lax.scan(body, emit, None, length=k)
            return e, rs[-1]
        return lambda: run(emit)

    tm, t1 = marginal(chain_rank_cumsum)
    print(f"  rank cumsum (C/B,B,G) i32: {tm*1e3:7.1f} ms "
          f"(t1 {t1*1e3:.0f})", flush=True)

    # --- 3b. intra-block rank via MXU matmul (bf16, counts <= 256) ---
    LT = jnp.tril(jnp.ones((B, B), jnp.bfloat16))

    def chain_rank_matmul(k):
        @jax.jit
        def run(emit):
            def body(e, _):
                eb = e.reshape(C // B, B, G).astype(jnp.bfloat16)
                r = jax.lax.dot_general(
                    LT, eb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (B, C//B, G)
                return e + r[0, 0, :1].astype(jnp.int8), r
            e, rs = jax.lax.scan(body, emit, None, length=k)
            return e, rs[-1]
        return lambda: run(emit)

    try:
        tm, t1 = marginal(chain_rank_matmul)
        print(f"  rank matmul bf16 (B,B)x(.,B,G): {tm*1e3:7.1f} ms "
              f"(t1 {t1*1e3:.0f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  rank matmul: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)

    # --- 4. block-base cumsum (C/B, G) int32 ---
    bc = jnp.sum(emit.reshape(C // B, B, G).astype(jnp.int32), axis=1)

    def chain_base(k):
        @jax.jit
        def run(bc):
            def body(b, _):
                r = jnp.cumsum(b, axis=0)
                return b + r[:1, :1], r
            b, rs = jax.lax.scan(body, bc, None, length=k)
            return b, rs[-1]
        return lambda: run(bc)

    tm, t1 = marginal(chain_base)
    print(f"  block-base cumsum (C/B,G): {tm*1e3:7.1f} ms "
          f"(t1 {t1*1e3:.0f})", flush=True)

    # --- 5. emitted-entry scatter: EMIT updates into (ng*L,) x2 ---
    ke = jax.random.PRNGKey(7)
    flat_idx = jax.random.randint(ke, (EMIT,), 0, NG_L, jnp.int32)
    vals = jnp.arange(EMIT, dtype=jnp.int32)

    def chain_scatter(k):
        @jax.jit
        def run(idx, vals):
            def body(v, _):
                a = jnp.zeros((NG_L + 1,), jnp.int32).at[idx].set(
                    v, mode="drop")
                b = jnp.zeros((NG_L + 1,), jnp.int32).at[idx].set(
                    v + 1, mode="drop")
                return v + a[:1] + b[:1], (a[0], b[0])
            v, _ = jax.lax.scan(body, vals, None, length=k)
            return v
        return lambda: run(flat_idx, vals)

    tm, t1 = marginal(chain_scatter)
    print(f"  entry scatter 2x{EMIT/1e6:.1f}M: {tm*1e3:7.1f} ms "
          f"(t1 {t1*1e3:.0f})", flush=True)

    # --- 6. pool-fill packed gather (14, ngL)[:, idx] at 6.5M ---
    table = jax.random.normal(ke, (14, NG_L + 1), jnp.float32)
    pidx = jax.random.randint(ke, (6_500_000,), 0, NG_L, jnp.int32)

    def chain_pool(k):
        @jax.jit
        def run(table, pidx):
            def body(t, _):
                v = t[:, pidx]
                return t + v[:, :1] * 1e-20, v[0, 0]
            t, _ = jax.lax.scan(body, table, None, length=k)
            return t
        return lambda: run(table, pidx)

    tm, t1 = marginal(chain_pool)
    print(f"  pool packed gather 6.5M idx: {tm*1e3:7.1f} ms "
          f"(t1 {t1*1e3:.0f})", flush=True)

    # --- 7. flat cumsum costs at worklist widths (the in-place fix
    # candidate: _traverse_global runs ~3 cap-width cumsums per level) ---
    for W in (1 << 21, 1 << 22):
        x = (jax.random.uniform(k3, (W,)) < 0.3).astype(jnp.int32)

        def chain_cs(k, x=x):
            @jax.jit
            def run(x):
                def body(v, _):
                    c = jnp.cumsum(v)
                    return v + c[:1], c[0]
                v, _ = jax.lax.scan(body, x, None, length=k)
                return v
            return lambda: run(x)

        tm, t1 = marginal(chain_cs)
        print(f"  flat cumsum W={W}: {tm*1e3:7.1f} ms "
              f"({tm/W*1e9:.1f} ns/el, t1 {t1*1e3:.0f})", flush=True)

        # hierarchical: block-reduce 512 + tiny cumsum + matmul rank
        LT512 = jnp.tril(jnp.ones((512, 512), jnp.bfloat16), k=-1)

        def chain_hier(k, x=x, W=W):
            @jax.jit
            def run(x):
                def body(v, _):
                    xb = v.reshape(W // 512, 512)
                    bs = jnp.sum(xb, axis=1)
                    bb = jnp.cumsum(bs) - bs
                    r = jax.lax.dot_general(
                        xb.astype(jnp.bfloat16), LT512,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    c = (r + bb[:, None].astype(jnp.float32)).astype(
                        jnp.int32).reshape(W)
                    return v + c[:1], c[0]
                v, _ = jax.lax.scan(body, x, None, length=k)
                return v
            return lambda: run(x)

        tm, t1 = marginal(chain_hier)
        print(f"  hier cumsum W={W}: {tm*1e3:7.1f} ms "
              f"({tm/W*1e9:.1f} ns/el, t1 {t1*1e3:.0f})", flush=True)

    # --- 8. segment_sum (sorted gidx) at worklist width ---
    Wseg = 1 << 22
    gidx = jnp.sort(jax.random.randint(k4, (Wseg,), 0, G, jnp.int32))
    ones = jnp.ones((Wseg,), jnp.int32)

    def chain_seg(k):
        @jax.jit
        def run(gidx, ones):
            def body(o, _):
                s = jax.ops.segment_sum(o, gidx, num_segments=G)
                return o + s[:1], s[0]
            o, _ = jax.lax.scan(body, ones, None, length=k)
            return o
        return lambda: run(gidx, ones)

    tm, t1 = marginal(chain_seg)
    print(f"  segment_sum W={Wseg}: {tm*1e3:7.1f} ms "
          f"({tm/Wseg*1e9:.1f} ns/el, t1 {t1*1e3:.0f})", flush=True)

    # --- 9. int8 transpose (C, G) -> (G, C) ---
    def chain_tr(k):
        @jax.jit
        def run(emit):
            def body(e, _):
                t = e.T + jnp.int8(0)
                return e + t[:1, :1].T, t[0, 0]
            e, _ = jax.lax.scan(body, emit, None, length=k)
            return e
        return lambda: run(emit)

    tm, t1 = marginal(chain_tr)
    print(f"  int8 transpose (C,G): {tm*1e3:7.1f} ms (t1 {t1*1e3:.0f})",
          flush=True)

    # --- 10. (1, 128) int8 slice rows at 32K block indices from (G, C) ---
    emitT = emit.T + jnp.int8(0)
    kb = jax.random.PRNGKey(9)
    bidx = jax.random.randint(kb, (32_768,), 0, C // 128, jnp.int32)
    gsel = jax.random.randint(kb, (32_768,), 0, G, jnp.int32)

    def chain_slice(k):
        @jax.jit
        def run(emitT, bidx, gsel):
            starts = jnp.stack([gsel, bidx * 128], axis=1)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0, 1))

            def body(e, _):
                v = jax.lax.gather(e, starts, dnums, (1, 128))
                return e + v[:1, :1], v[0, 0]
            e, _ = jax.lax.scan(body, emitT, None, length=k)
            return e
        return lambda: run(emitT, bidx, gsel)

    try:
        tm, t1 = marginal(chain_slice)
        print(f"  (1,128) slice-gather 32K: {tm*1e3:7.1f} ms "
              f"(t1 {t1*1e3:.0f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  slice-gather: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)

    # --- 11. (10, 128) f32 attr-slice gather at 32K block starts ---
    attrs = jax.random.normal(kb, (10, C), jnp.float32)

    def chain_attr(k):
        @jax.jit
        def run(attrs, bidx):
            starts = jnp.stack([jnp.zeros_like(bidx), bidx * 128], axis=1)
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1))

            def body(a, _):
                v = jax.lax.gather(a, starts, dnums, (10, 128))
                return a + v[0, :, :1] * 1e-20, v[0, 0, 0]
            a, _ = jax.lax.scan(body, attrs, None, length=k)
            return a
        return lambda: run(attrs, bidx)

    try:
        tm, t1 = marginal(chain_attr)
        print(f"  (10,128) attr-slice gather 32K: {tm*1e3:7.1f} ms "
              f"(t1 {t1*1e3:.0f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  attr-slice gather: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
