"""Distributed sample-sort over the device mesh's bodies axis.

Replaces the replicated global Morton sort in the sharded rebuild
(``parallel/sharded.py``): round 2 ``all_gather``-ed the full unsorted
state and ran an identical ``argsort(N)`` on every device.  Here each
device sorts only its shard and ships bodies directly to their owners:

1. local ``argsort`` of the shard's Morton codes (``N/D log`` work);
2. splitter selection from ``n_samples`` evenly-spaced local codes,
   ``all_gather``-ed (tiny) and shared by all devices — classic
   sample-sort (the TPU twist: every capacity below is STATIC);
3. one ``all_to_all`` of statically-capped per-destination bins (bodies
   are already locally sorted, so each bin is one contiguous run);
4. local merge-sort of the received runs;
5. EXACT rebalance to ``N/D`` bodies per device: global ranks come from
   an exclusive scan of received counts, and the few boundary bodies
   shift via two neighbour ``ppermute`` hops.

Static caps can theoretically overflow (a pathological splitter draw);
every overflow is detected and ``ok=False`` is returned (reduced across
the mesh) so the caller can fall back to the replicated sort for that
rebuild — correctness never depends on the sample quality.

No counterpart exists in the reference (single-process CPU/GPU,
``nbody/simulation.py:63-198`` builds one tree); this is the pod-scale
design SURVEY.md §2's parallelism checklist calls for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max


def _pad_bins(codes, vals_f, vals_i, dest, D, cap):
    """Scatter locally-sorted rows into (D, cap) per-destination bins.

    ``dest`` must be sorted ascending (codes are sorted and splitters
    monotone), so each destination's rows form one contiguous run.
    Returns padded (D*cap,)-leading arrays plus the overflow flag.
    """
    nl = codes.shape[0]
    bstart = jnp.searchsorted(dest, jnp.arange(D, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    bcount = jnp.concatenate(
        [bstart[1:], jnp.array([nl], jnp.int32)]) - bstart
    ovf = jnp.any(bcount > cap)
    k = jnp.arange(cap, dtype=jnp.int32)
    src = bstart[:, None] + k[None, :]                     # (D, cap)
    valid = k[None, :] < bcount[:, None]
    src_c = jnp.clip(src, 0, nl - 1).reshape(-1)
    pc = jnp.where(valid.reshape(-1), codes[src_c], INT32_MAX)
    pf = jnp.where(valid.reshape(-1)[None, :], vals_f[:, src_c], 0.0)
    pi = jnp.where(valid.reshape(-1)[None, :], vals_i[:, src_c], 0)
    return pc, pf, pi, ovf


def sample_sort_local(codes_l, rows_f, rows_i, *, axis, ndev,
                      n_samples=128, cap_factor=2.0):
    """Shard-local body of the distributed sample-sort (use in shard_map).

    Args:
      codes_l: ``(nl,)`` int32 Morton codes of this device's bodies.
      rows_f: ``(F, nl)`` f32 payload rows (pos, vel, mass, acc...).
      rows_i: ``(I, nl)`` int32 payload rows (e.g. previous slot ids).
        Ints travel as int32 — bitcasting them through f32 flushes
        denormal bit patterns to zero on TPU (measured round 3).
      axis: mesh axis name.
      ndev: static device count D.
    Returns:
      ``(codes, rows_f, rows_i, ok)`` — the device's EXACT ``nl``-body
      shard of the globally sorted order, and the all-reduced success
      flag (False = a static cap overflowed; caller must fall back).
    """
    D = ndev
    nl = codes_l.shape[0]
    dev = jax.lax.axis_index(axis)

    # 1. Local sort.
    o = jnp.argsort(codes_l)
    codes = codes_l[o]
    vf = rows_f[:, o]
    vi = rows_i[:, o]

    # 2. Splitters: evenly spaced local samples, gathered globally.
    s_idx = (jnp.arange(n_samples) * nl) // n_samples + nl // (
        2 * n_samples)
    samp = codes[jnp.clip(s_idx, 0, nl - 1)]
    all_samp = jnp.sort(jax.lax.all_gather(samp, axis, tiled=True))
    sp_idx = (jnp.arange(1, D) * D * n_samples) // D
    splitters = all_samp[sp_idx]                           # (D-1,)

    # 3. Destination bins (contiguous runs) -> padded all_to_all.
    dest = jnp.searchsorted(splitters, codes,
                            side="right").astype(jnp.int32)
    cap = int(cap_factor * nl / D + 0.5)
    cap = max(64, ((cap + 7) // 8) * 8)
    pc, pf, pi, ovf1 = _pad_bins(codes, vf, vi, dest, D, cap)
    rc = jax.lax.all_to_all(pc.reshape(D, cap), axis, 0, 0,
                            tiled=False).reshape(-1)
    rf = jax.lax.all_to_all(pf.reshape(-1, D, cap), axis, 1, 1,
                            tiled=False).reshape(vf.shape[0], -1)
    ri = jax.lax.all_to_all(pi.reshape(-1, D, cap), axis, 1, 1,
                            tiled=False).reshape(vi.shape[0], -1)

    # 4. Merge the D sorted runs (one argsort of D*cap; sentinels sink).
    o2 = jnp.argsort(rc)
    rc = rc[o2]
    rf = rf[:, o2]
    ri = ri[:, o2]
    r_n = jnp.sum(rc != INT32_MAX).astype(jnp.int32)

    # 5. Exact rebalance to nl bodies: my received run covers global
    # ranks [o_b, o_b + r_n); targets are [dev*nl, (dev+1)*nl).  The
    # sample guarantee keeps |o_b - dev*nl| small; boundary bodies
    # arrive from the two neighbours via ppermute.
    all_rn = jax.lax.all_gather(r_n, axis, tiled=False)    # (D,)
    o_b = (jnp.cumsum(all_rn) - all_rn)[dev]
    H = cap
    DC = D * cap

    def tail(a):
        # Last H valid slots (static shape; start clamped).
        start = jnp.maximum(r_n - H, 0)
        if a.ndim == 1:
            return jax.lax.dynamic_slice(a, (start,), (H,))
        return jax.lax.dynamic_slice(
            a, (0, start), (a.shape[0], H))

    right_fwd = [(i, i + 1) for i in range(D - 1)]
    left_fwd = [(i + 1, i) for i in range(D - 1)]
    fl_c = jax.lax.ppermute(tail(rc), axis, right_fwd)
    fl_f = jax.lax.ppermute(tail(rf), axis, right_fwd)
    fl_i = jax.lax.ppermute(tail(ri), axis, right_fwd)
    fr_c = jax.lax.ppermute(rc[:H], axis, left_fwd)
    fr_f = jax.lax.ppermute(rf[:, :H], axis, left_fwd)
    fr_i = jax.lax.ppermute(ri[:, :H], axis, left_fwd)

    # Neighbour metadata for rank arithmetic.
    rn_l = jax.lax.ppermute(r_n, axis, right_fwd)      # left nb's count
    ob_l = jax.lax.ppermute(o_b, axis, right_fwd)      # left nb's start

    stage_c = jnp.concatenate([fl_c, rc, fr_c])
    stage_f = jnp.concatenate([fl_f, rf, fr_f], axis=1)
    stage_i = jnp.concatenate([fl_i, ri, fr_i], axis=1)

    t = dev * nl + jnp.arange(nl, dtype=jnp.int32)         # target ranks
    # from_left slot k holds left-neighbour rank ob_l + max(rn_l-H,0)+k.
    left_rank0 = ob_l + jnp.maximum(rn_l - H, 0)
    s = jnp.where(
        t < o_b, t - left_rank0,
        jnp.where(t < o_b + r_n, H + (t - o_b),
                  H + DC + (t - (o_b + r_n))))
    ovf2 = jnp.any((s < 0) | (s >= H + DC + H))
    s_c = jnp.clip(s, 0, H + DC + H - 1)
    out_c = stage_c[s_c]
    out_f = stage_f[:, s_c]
    out_i = stage_i[:, s_c]

    bad = (ovf1 | ovf2).astype(jnp.int32)
    ok = jax.lax.pmax(bad, axis) == 0
    return out_c, out_f, out_i, ok
