"""Pallas kernel for the boids Morton-window neighbour accumulation.

Replaces the XLA dense accumulation in
:func:`spatialsim_tpu.ops.boids_ops._window_accumulate` on TPU.  The XLA
form materializes (3, gsz, W) difference tensors in HBM and reduces over
the window axis — ~30 ms real at 500K agents (dispatch-floor-corrected,
scripts/decide11.py methodology).

Design (v3), mirroring the n-body row kernel's proven-fast structure:

* SOURCES ride LANES: (1, gsz) rows read straight from a staged
  contiguous window span (same ``fori_loop`` + ``pl.ds`` pattern as the
  n-body far-tile loop);
* TARGETS ride SUBLANES via an in-kernel MXU transpose (identity-matmul
  at HIGHEST precision — exact for f32; Mosaic's plain sublane<->lane
  transposes lower element-by-element and dominated earlier variants);
* all 14 neighbour accumulators are DEFERRED (iblk, gsz) elementwise
  running sums — one cross-lane reduction set per target block instead
  of one per (block, view), which is what made the naive row form lose
  to the column form in round 2;
* the 14 reduced columns transpose back to output rows with one more
  tiny MXU identity-matmul per block.

State rows (16, npad): [x, y, z, grp, vx, vy, vz, cx, cy, cz, 0...] —
``grp`` carries the PREVIOUS pass's group id for the second pass's exact
window dedup (``|grp_t - grp_s| <= prev_wg`` pairs were already counted
by pass 1; reference semantics ``flock.py`` neighbour loops count each
pair once).  Output rows (16, npad): [sep3, align3, coh3, csum3,
sep_count, nb_count, 0, 0].

Capability parity: reference ``boids/flock.py`` grid neighbour search
(27-cell scan, perception/separation radii, per-force accumulators).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _boids_kernel(*refs, gsz, wg, gpp, iblk, perception_sq,
                  separation_sq, dedup, prev_wg):
    n_views = gpp + 2 * wg
    window_refs = refs[:n_views]
    out_ref = refs[-2]
    wspan = refs[-1]             # (16, n_views*gsz) VMEM scratch
    n_window = 2 * wg + 1
    hi = jax.lax.Precision.HIGHEST

    for k in range(n_views):
        wspan[:, k * gsz:(k + 1) * gsz] = window_refs[k][:]

    ii = jax.lax.broadcasted_iota(jnp.int32, (gsz, gsz), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (gsz, gsz), 1)
    eye = jnp.where(ii == jj, 1.0, 0.0).astype(jnp.float32)

    for j in range(gpp):
        base = j * gsz
        # Targets (x, y, z, grp) onto sublanes: one MXU transpose.
        T = jax.lax.dot_general(
            eye, window_refs[j + wg][0:4, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)  # (gsz, 4)
        for i0 in range(0, gsz, iblk):
            xi = T[i0:i0 + iblk, 0:1]
            yi = T[i0:i0 + iblk, 1:2]
            zi = T[i0:i0 + iblk, 2:3]
            gi = T[i0:i0 + iblk, 3:4]
            accs = tuple(jnp.zeros((iblk, gsz), jnp.float32)
                         for _ in range(14))

            def view_body(k, accs, xi=xi, yi=yi, zi=zi, gi=gi, j=j):
                off = pl.multiple_of((j + k) * gsz, gsz)
                sx = wspan[0:1, pl.ds(off, gsz)]
                sy = wspan[1:2, pl.ds(off, gsz)]
                sz = wspan[2:3, pl.ds(off, gsz)]
                dx = xi - sx
                dy = yi - sy
                dz = zi - sz
                d2 = dx * dx + dy * dy + dz * dz
                is_nb = (d2 < perception_sq) & (d2 > 0.0001)
                if dedup:
                    sg = wspan[3:4, pl.ds(off, gsz)]
                    is_nb &= jnp.abs(gi - sg) > prev_wg
                nbf = jnp.where(is_nb, 1.0, 0.0)
                sepf = jnp.where(d2 < separation_sq, nbf, 0.0)
                wsep = sepf / jnp.maximum(d2, 1e-12)
                svx = wspan[4:5, pl.ds(off, gsz)]
                svy = wspan[5:6, pl.ds(off, gsz)]
                svz = wspan[6:7, pl.ds(off, gsz)]
                scx = wspan[7:8, pl.ds(off, gsz)]
                scy = wspan[8:9, pl.ds(off, gsz)]
                scz = wspan[9:10, pl.ds(off, gsz)]
                return (accs[0] + wsep * dx,
                        accs[1] + wsep * dy,
                        accs[2] + wsep * dz,
                        accs[3] + nbf * svx,
                        accs[4] + nbf * svy,
                        accs[5] + nbf * svz,
                        accs[6] + nbf * sx,
                        accs[7] + nbf * sy,
                        accs[8] + nbf * sz,
                        accs[9] + nbf * scx,
                        accs[10] + nbf * scy,
                        accs[11] + nbf * scz,
                        accs[12] + sepf,
                        accs[13] + nbf)

            accs = jax.lax.fori_loop(0, n_window, view_body, accs)
            # One reduction set per block, then one tiny MXU transpose
            # back to output-row orientation.
            cols = jnp.concatenate(
                [jnp.sum(a, axis=1, keepdims=True) for a in accs]
                + [jnp.zeros((iblk, 2), jnp.float32)],
                axis=1)                                     # (iblk, 16)
            eyeb = eye[0:iblk, 0:iblk] if iblk != gsz else eye
            rows = jax.lax.dot_general(
                cols, eyeb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=hi)                               # (16, iblk)
            out_ref[:, base + i0:base + i0 + iblk] = rows
    # sep is (target - source)-oriented: the XLA oracle computes
    # d = target - source and sums wsep*d, matching dx above.


@functools.partial(
    jax.jit,
    static_argnames=("gsz", "wg", "perception_sq", "separation_sq",
                     "prev_wg", "groups_per_program", "iblk"))
def boids_window_pallas(state16, *, gsz, wg, perception_sq,
                        separation_sq, prev_wg=None,
                        groups_per_program=4, iblk=64):
    """Window neighbour accumulators for SORTED padded boid state.

    Args:
      state16: ``(16, npad)`` f32 rows [x, y, z, grp, vel3, col3, 0...]
        (padding slots carry pos 1e9 so they never neighbour anyone;
        ``grp`` is the previous pass's group id when deduping).
      prev_wg: static — previous pass's window half-width for the exact
        dedup, or None for a first (dedup-free) pass.
    Returns:
      ``(16, npad)`` f32 accumulator rows [sep3, align3, coh3, csum3,
      sep_count, nb_count, 0, 0] in the same sorted layout.
    """
    npad = state16.shape[1]
    ng = npad // gsz
    gpp = max(1, groups_per_program)
    ng2 = ((ng + gpp - 1) // gpp) * gpp
    gpad = ng2 - ng

    # Window padding: wg edge groups each side plus group-axis padding —
    # position rows get the far-away fill so padded slots are never
    # neighbours.
    fill = jnp.zeros((16, 1), jnp.float32).at[0:3, 0].set(1e9)
    left = jnp.broadcast_to(fill, (16, wg * gsz))
    right = jnp.broadcast_to(fill, (16, (wg + gpad) * gsz))
    winpad = jnp.concatenate([left, state16, right], axis=1)

    n_views = gpp + 2 * wg
    in_specs = [
        pl.BlockSpec((16, gsz), (lambda g, k=k: (0, g * gpp + k)))
        for k in range(n_views)]

    kernel = functools.partial(
        _boids_kernel, gsz=gsz, wg=wg, gpp=gpp,
        iblk=min(iblk, gsz),
        perception_sq=float(perception_sq),
        separation_sq=float(separation_sq),
        dedup=prev_wg is not None,
        prev_wg=float(prev_wg if prev_wg is not None else 0))

    interpret = jax.default_backend() != "tpu"
    Wsz = (2 * wg + 1) * gsz
    out = pl.pallas_call(
        kernel,
        grid=(ng2 // gpp,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((16, gpp * gsz), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((16, ng2 * gsz), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16, n_views * gsz), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(ng) * gsz * Wsz * 40,
            bytes_accessed=ng * gsz * 16 * 4 * 2,
            transcendentals=0),
        interpret=interpret,
    )(*([winpad] * n_views))
    return out[:, :npad]
