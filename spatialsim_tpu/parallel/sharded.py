"""Sharded force engines + multi-device step.

Bodies are sharded over the mesh's ``bodies`` axis (`(3, N)` arrays shard
along axis 1).  Two force engines:

* :func:`ring_allpairs_accel` — the sharded O(N²) path.  Each device keeps
  its i-block resident and ring-rotates the j-blocks with ``lax.ppermute``
  (one hop per step, D steps total), accumulating partial forces.  This is
  exactly the blockwise pattern of the reference's tiled CUDA/MPS kernels
  (``nbody/gpu_backend.py:179-240,457-501``) lifted from shared-memory
  tiles to ICI neighbours — SURVEY.md §2's "ring attention with gravity in
  place of softmax".
* :func:`sharded_barnes_hut_accel` — the sharded O(N log N) path.  Device
  d ``all_gather``s positions+masses, builds the (replicated) octree, but
  traverses only its own slice of Morton groups — the traversal dominates
  the cost, so work parallelizes over devices even though the build is
  replicated.  A final ``all_gather`` of sorted accelerations lets every
  device pick up its own bodies' results.

Determinism: both engines use fixed reduction orders (scan over ring hops;
segment-sums over a deterministic sort), so 1-chip and D-chip runs agree to
float32 tolerance (tested in tests/test_sharded.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from spatialsim_tpu.parallel.mesh import BODY_AXIS
from spatialsim_tpu.ops.bounds import compute_bounds
from spatialsim_tpu.ops.morton import morton_encode
from spatialsim_tpu.ops.octree import build_octree
from spatialsim_tpu.ops.integrator import integrate
from spatialsim_tpu.ops import barnes_hut as bh


def shard_state(state, mesh: Mesh):
    """Place a NBodyState pytree with bodies sharded over the mesh."""
    sh2 = NamedSharding(mesh, P(None, BODY_AXIS))
    sh1 = NamedSharding(mesh, P(BODY_AXIS))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, sh2 if a.ndim == 2 else sh1), state)


def _partial_accel(pos_i, pos_j, mass_j, G, soft_sq):
    """Forces of one j-block on the local i-block ((3,ni) x (3,nj))."""
    d = pos_j[:, None, :] - pos_i[:, :, None]
    dist_sq = jnp.sum(d * d, axis=0) + soft_sq
    inv = jax.lax.rsqrt(dist_sq)
    w = jnp.where(dist_sq > soft_sq, (G * mass_j)[None, :] * inv * inv * inv,
                  0.0)
    return jnp.sum(w[None, :, :] * d, axis=2)


def ring_allpairs_accel(pos, mass, mesh: Mesh, G, softening):
    """All-pairs accelerations with a ppermute ring over the bodies axis.

    Args:
      pos: ``(3, N)`` sharded along axis 1 (N divisible by mesh size).
      mass: ``(N,)`` sharded.
    Returns:
      ``(3, N)`` accelerations with the same sharding.
    """
    G = float(G)
    soft_sq = float(softening) ** 2
    axis = BODY_AXIS
    ndev = mesh.shape[axis]

    def local(pos_l, mass_l):
        perm = [(i, (i + 1) % ndev) for i in range(ndev)]

        def hop(carry, _):
            acc, pj, mj = carry
            acc = acc + _partial_accel(pos_l, pj, mj, G, soft_sq)
            pj = jax.lax.ppermute(pj, axis, perm)
            mj = jax.lax.ppermute(mj, axis, perm)
            return (acc, pj, mj), None

        init = (jnp.zeros_like(pos_l), pos_l, mass_l)
        (acc, _, _), _ = jax.lax.scan(hop, init, None, length=ndev)
        return acc

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(None, axis))(pos, mass)


def sharded_barnes_hut_accel(pos, mass, mesh: Mesh, config):
    """Barnes-Hut with replicated tree + device-local group traversal."""
    from spatialsim_tpu.config.nbody import resolve_config
    config = resolve_config(config, pos.shape[1])
    axis = BODY_AXIS
    ndev = mesh.shape[axis]
    n = pos.shape[1]
    gsz = config.group_size
    theta = float(config.theta)
    G = float(config.G)
    soft_sq = float(config.softening) ** 2
    depth = config.max_depth
    leaf = config.leaf_size
    fcap = config.frontier_capacity
    nran = config.near_capacity // config.leaf_size

    # Static sizing: npad groups split evenly across devices.
    npad = ((n + gsz - 1) // gsz) * gsz
    n_groups = npad // gsz
    if n_groups % ndev != 0:
        # Round groups up to a device multiple; extra groups are all-padding.
        n_groups = ((n_groups + ndev - 1) // ndev) * ndev
        npad = n_groups * gsz
    groups_per_dev = n_groups // ndev

    def local(pos_l, mass_l):
        dev = jax.lax.axis_index(axis)
        # Replicate the body set; every device sees the same global sort.
        pos_f = jax.lax.all_gather(pos_l, axis, axis=1, tiled=True)
        mass_f = jax.lax.all_gather(mass_l, axis, tiled=True)

        half = compute_bounds(pos_f)
        codes = morton_encode(pos_f, half, depth)
        order = jnp.argsort(codes)
        pad = npad - n
        s_codes = jnp.concatenate(
            [codes[order], jnp.broadcast_to(codes[order[-1]], (pad,))])
        s_pos = jnp.concatenate(
            [pos_f[:, order],
             jnp.broadcast_to(pos_f[:, order[-1]][:, None], (3, pad))],
            axis=1)
        s_mass = jnp.concatenate([mass_f[order], jnp.zeros((pad,))])

        tree = build_octree(s_codes, s_pos, s_mass, half, max_depth=depth,
                            start_level=2, n=npad)

        # This device's contiguous slice of Morton groups.
        g0 = dev * groups_per_dev * gsz
        my_pos = jax.lax.dynamic_slice_in_dim(
            s_pos, g0, groups_per_dev * gsz, axis=1)
        gp = my_pos.reshape(3, groups_per_dev, gsz)
        gm = jax.lax.dynamic_slice_in_dim(
            s_mass, g0, groups_per_dev * gsz).reshape(groups_per_dev, gsz)
        bmin = jnp.min(gp, axis=2).T
        bmax = jnp.max(gp, axis=2).T

        traverse = functools.partial(
            bh._traverse_group, tree=tree, sorted_pos=s_pos,
            sorted_mass=s_mass, theta=theta, G=G, soft_sq=soft_sq,
            leaf_size=leaf, frontier_cap=fcap, near_ranges=nran, n=npad)
        acc_l = jax.vmap(traverse)(
            jnp.moveaxis(gp, 1, 0), gm, bmin, bmax)     # (gpd, 3, gsz)
        acc_l = jnp.moveaxis(acc_l, 0, 1).reshape(3, groups_per_dev * gsz)

        # Collect the full sorted acceleration, then pick out the original-
        # order slice this device owns.
        acc_sorted = jax.lax.all_gather(acc_l, axis, axis=1, tiled=True)
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        nl = n // ndev
        my_orig = jax.lax.dynamic_slice_in_dim(inv, dev * nl, nl)
        return acc_sorted[:, my_orig]

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(None, axis))(pos, mass)


def make_sharded_window_step(config, n: int, mesh: Mesh, substeps: int = 1):
    """Sharded production engine: groups (and their lists) split by device.

    Layout per device d of D (state Morton-SORTED, like the single-chip
    engine — device d owns the contiguous sorted slot range
    ``[d·n/D, (d+1)·n/D)``, so shards are spatially coherent and the hot
    step is gather-free):

      * the sort permutation and octree are recomputed identically on
        every device at rebuild (deterministic, ~10% of rebuild cost)
        while the traversal — the dominant cost — runs only over this
        device's group range (``group_offset`` into
        :func:`spatialsim_tpu.ops.bh_window.build_lists`);
      * interaction lists shard along the group axis;
      * per substep: a ±``window_groups`` HALO EXCHANGE — two ppermute
        hops carrying ``wg * group_size`` edge bodies each (the Morton
        window is the only cross-shard data the eval needs), then the
        fused Pallas eval in ``haloed`` mode, whose output IS this
        device's shard.  Round 2 all_gathered the full state every
        substep (>= 36 MB/substep at 1M over ICI); the halo is
        ``2 * wg * gsz * 16`` bytes (~33 KB) regardless of N;
      * full ``all_gather``s happen only inside the rebuild branch;
      * at rebuild: the state re-sorts and the slot -> original-body
        mapping composes, exactly as in the single-chip stepper.

    Returns ``(jitted_step, init_fn)``; ``init_fn(pos, vel, mass)``
    (original body order) places a correctly-sharded
    :class:`WindowBHState`.
    """
    from spatialsim_tpu.ops.bh_window import (
        WindowBHState, _build_kw, build_lists, build_lists_sorted)
    from spatialsim_tpu.ops.bh_eval_kernel import pallas_window_eval
    from spatialsim_tpu.ops.integrator import integrate
    from spatialsim_tpu.parallel.distsort import sample_sort_local

    from spatialsim_tpu.config.nbody import resolve_config
    config = resolve_config(config, n)
    axis = BODY_AXIS
    D = mesh.shape[axis]
    gsz = config.group_size
    if n % (D * gsz) != 0:
        raise ValueError("num_bodies must divide evenly by devices*groups")
    npad = n
    ng = npad // gsz
    ngl = ng // D
    nlb = n // D
    kw = _build_kw(config)
    # Spatial neighbour groups can live outside the halo; the sharded
    # engine covers seams by deep traversal instead (config.near_groups
    # docs).  Ranges stay ON: far_range holds GLOBAL sorted slots, and
    # the state is stored globally sorted (shards are contiguous sorted
    # ranges), so a refresh needs one all_gather of the state — the same
    # collective the rebuild branch already pays — after which each
    # device refreshes its own shard of entries with the single-chip
    # math (round 3 forced with_ranges=False and had no staleness
    # escape; VERDICT r3 weak #4).
    kw["near_groups"] = 0
    kw["pool_tile"] = 0   # haloed eval reads dense per-device blocks
    interval = config.rebuild_interval
    refresh_iv = int(getattr(config, "refresh_interval", 0) or 0)
    skin = float(config.skin)
    drift_mode = getattr(config, "rebuild_drift_mode", "max")
    damping = config.damping
    wg = config.window_groups
    Gf = float(config.G)
    advance2 = getattr(config, "advance_order", 2) >= 2
    quad = getattr(config, "use_quadrupole", False)
    tau_clamp = float(getattr(config, "advance_tau_clamp", 24))

    def step_local(pos_l, vel_l, mass_l, acc_l, order, inv_order, far_l,
                   far_n_l, fr_l, ref_l, steps_since, steps_build, dt):
        dev = jax.lax.axis_index(axis)

        halo = wg * gsz

        def substep(carry, _):
            (pos_l, vel_l, mass_l, acc_l, order, inv_order, far_l,
             far_n_l, fr_l, ref_l, ss, sb) = carry

            # Halo exchange: each device ships its wg edge GROUPS (pos +
            # mass packed into one 4-row ppermute per direction) to its
            # Morton neighbours.  Non-cyclic: the outermost devices'
            # missing halos arrive as zeros — zero mass, so they
            # contribute nothing, exactly like the single-chip zero
            # padding.
            pm_l = jnp.concatenate([pos_l, mass_l[None, :]], axis=0)
            from_left = jax.lax.ppermute(
                pm_l[:, -halo:], axis,
                [(i, i + 1) for i in range(D - 1)])
            from_right = jax.lax.ppermute(
                pm_l[:, :halo], axis,
                [(i + 1, i) for i in range(D - 1)])

            def do_rebuild(args):
                # DISTRIBUTED sample-sort: each device sorts only its
                # shard and ships bodies to their owners (one
                # all_to_all); the replicated argsort(N) of round 2
                # survives only as the static-cap-overflow fallback.
                # The subsequent all_gather ships the already-SORTED
                # state for the (replicated) octree + this device's
                # group-slice traversal.
                half_g = jax.lax.pmax(compute_bounds(pos_l), axis)
                codes_l = morton_encode(pos_l, half_g,
                                        kw["max_depth"])
                frows = [pos_l, vel_l, mass_l[None, :]]
                if advance2:
                    frows.append(acc_l)
                prev_slot = (dev * nlb + jnp.arange(nlb, dtype=jnp.int32)
                             )[None, :]
                sc_, sf_, si_, ok = sample_sort_local(
                    codes_l, jnp.concatenate(frows, axis=0), prev_slot,
                    axis=axis, ndev=D)

                def gather_dist(_):
                    sp = jax.lax.all_gather(sf_[0:3], axis, axis=1,
                                            tiled=True)
                    sv = jax.lax.all_gather(sf_[3:6], axis, axis=1,
                                            tiled=True)
                    sm = jax.lax.all_gather(sf_[6], axis, tiled=True)
                    sa = (jax.lax.all_gather(sf_[7:10], axis, axis=1,
                                             tiled=True)
                          if advance2 else jnp.zeros((0, n)))
                    o = jax.lax.all_gather(si_[0], axis, tiled=True)
                    return sp, sv, sm, sa, o

                def gather_rep(_):
                    pos_f = jax.lax.all_gather(pos_l, axis, axis=1,
                                               tiled=True)
                    vel_f = jax.lax.all_gather(vel_l, axis, axis=1,
                                               tiled=True)
                    mass_f = jax.lax.all_gather(mass_l, axis, tiled=True)
                    acc_f = (jax.lax.all_gather(acc_l, axis, axis=1,
                                                tiled=True)
                             if advance2 else jnp.zeros((0, n)))
                    codes = morton_encode(pos_f, half_g, kw["max_depth"])
                    o = jnp.argsort(codes).astype(jnp.int32)
                    return (pos_f[:, o], vel_f[:, o], mass_f[o],
                            acc_f[:, o] if advance2 else acc_f, o)

                s_pos_f, s_vel_f, s_mass_f, s_acc_f, o = jax.lax.cond(
                    ok, gather_dist, gather_rep, None)
                skw = {k: v for k, v in kw.items()}
                nl = build_lists_sorted(
                    s_pos_f, s_vel_f, s_mass_f,
                    s_acc_f if advance2 else None, order=o,
                    group_offset=dev * ngl, n_groups=ngl, **skw)
                o = nl.order                  # new slot -> previous slot
                to_orig = order[o]
                o_inv = jnp.zeros((n,), jnp.int32).at[o].set(
                    jnp.arange(n, dtype=jnp.int32))
                inv_new = o_inv[inv_order]
                pos_l2 = jax.lax.dynamic_slice_in_dim(
                    s_pos_f, dev * nlb, nlb, axis=1)
                vel_l2 = jax.lax.dynamic_slice_in_dim(
                    s_vel_f, dev * nlb, nlb, axis=1)
                mass_l2 = jax.lax.dynamic_slice_in_dim(
                    s_mass_f, dev * nlb, nlb)
                # Haloed eval inputs sliced straight from the re-sorted
                # full arrays (the pre-exchanged halos used the OLD
                # layout); no permutation gather — the state IS sorted.
                pm_f = jnp.pad(
                    jnp.concatenate(
                        [s_pos_f, s_mass_f[None, :]], axis=0),
                    ((0, 0), (halo, halo)))
                pm_h = jax.lax.dynamic_slice_in_dim(
                    pm_f, dev * nlb, nlb + 2 * halo, axis=1)
                return (pos_l2, vel_l2, mass_l2, to_orig, inv_new,
                        nl.far, nl.far_n, nl.far_range, pos_l2,
                        jnp.int32(0), jnp.int32(0), pm_h)

            def keep(args):
                (pos_k, vel_k, mass_k, order_k, inv_k, far_k, farn_k,
                 fr_k, ref_k, ss_k, sb_k) = args
                if refresh_iv:
                    # Moment refresh (single-chip semantics): all_gather
                    # the globally-sorted state, re-materialize THIS
                    # device's entries from global prefix sums
                    # (ops/bh_window._refresh_dense_core), reset ss.
                    def do_refresh(args2):
                        far_k, ss_k = args2
                        pos_f = jax.lax.all_gather(pos_k, axis, axis=1,
                                                   tiled=True)
                        vel_f = jax.lax.all_gather(vel_k, axis, axis=1,
                                                   tiled=True)
                        mass_f = jax.lax.all_gather(mass_k, axis,
                                                    tiled=True)
                        acc_f = (jax.lax.all_gather(acc_l, axis, axis=1,
                                                    tiled=True)
                                 if advance2 else None)
                        from spatialsim_tpu.ops.bh_window import (
                            _refresh_dense_core)
                        far_new = _refresh_dense_core(
                            far_k, fr_k, pos_f, vel_f, mass_f, acc_f,
                            ss_k, dt, tau_clamp)
                        return far_new, jnp.int32(0)
                    far_k, ss_k = jax.lax.cond(
                        ss_k >= refresh_iv, do_refresh,
                        lambda a: a, (far_k, ss_k))
                pm_h = jnp.concatenate([from_left, pm_l, from_right],
                                       axis=1)
                return (pos_k, vel_k, mass_k, order_k, inv_k, far_k,
                        farn_k, fr_k, ref_k, ss_k, sb_k, pm_h)

            need = sb >= interval
            if drift_mode == "max":
                # Verlet-skin safety: rebuild when ANY body (across the
                # whole mesh) drifted past skin/2 since the last build.
                drift = jax.lax.pmax(
                    jnp.max(jnp.abs(pos_l - ref_l)), axis)
                need = need | (drift > skin * 0.5)
            (pos_l2, vel_l2, mass_l2, order2, inv2, far2, farn2, fr2,
             ref2, ss2, sb2, pm_h) = jax.lax.cond(
                need, do_rebuild, keep,
                (pos_l, vel_l, mass_l, order, inv_order, far_l, far_n_l,
                 fr_l, ref_l, ss, sb))

            # Haloed eval: inputs are purely local (+halos), so one
            # kernel serves every device (round 2 needed a lax.switch
            # over D compiled offsets) and the output IS this device's
            # sorted shard — integrate directly, no collective.  Raw
            # stored entries; the kernel applies the τ advance itself.
            acc_l = pallas_window_eval(
                pm_h[0:3], pm_h[3], far2, farn2,
                None, ss2, dt,
                G=Gf, softening=config.softening, group_size=gsz,
                window_groups=wg, haloed=True,
                tau_clamp=tau_clamp)

            pos3, vel3 = integrate(pos_l2, vel_l2, acc_l, dt, damping)
            acc_carry = acc_l if advance2 else None
            return (pos3, vel3, mass_l2, acc_carry, order2, inv2, far2,
                    farn2, fr2, ref2, ss2 + 1, sb2 + 1), None

        init = (pos_l, vel_l, mass_l, acc_l, order, inv_order, far_l,
                far_n_l, fr_l, ref_l, steps_since, steps_build)
        out, _ = jax.lax.scan(substep, init, None, length=substeps)
        return out

    sh2 = P(None, axis)
    sh1 = P(axis)
    rep = P()
    acc_spec = sh2 if advance2 else rep
    fr_spec = P(axis, None, None)
    in_specs = (sh2, sh2, sh1, acc_spec, rep, rep, P(axis, None, None),
                sh1, fr_spec, sh2, rep, rep, rep)
    out_specs = (sh2, sh2, sh1, acc_spec, rep, rep, P(axis, None, None),
                 sh1, fr_spec, sh2, rep, rep)
    try:
        smapped = shard_map(step_local, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_rep=False)
    except TypeError:  # newer jax renamed the replication check
        smapped = shard_map(step_local, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)

    def step(state: WindowBHState, dt):
        lists = state.lists
        (pos, vel, mass, acc, order, inv_order, far, far_n, fr, ref,
         ss, sb) = smapped(
            state.pos, state.vel, state.mass, state.acc, lists.order,
            lists.inv_order, lists.far, lists.far_n, lists.far_range,
            lists.ref_pos, lists.steps_since, lists.steps_build, dt)
        new_lists = lists._replace(order=order, inv_order=inv_order,
                                   far=far, far_n=far_n, far_range=fr,
                                   ref_pos=ref, steps_since=ss,
                                   steps_build=sb)
        return WindowBHState(pos, vel, mass, new_lists, acc)

    def init_fn(pos, vel, mass):
        acc0 = jnp.zeros_like(pos) if advance2 else None
        lists = build_lists(pos, vel, mass, acc0, **kw)
        o_real = lists.order[:n]
        pos_s = pos[:, o_real]
        vel_s = vel[:, o_real]
        mass_s = mass[o_real]
        place = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
        lists = lists._replace(
            far=place(lists.far, P(BODY_AXIS, None, None)),
            far_n=place(lists.far_n, sh1),
            far_range=place(lists.far_range, P(BODY_AXIS, None, None)),
            ref_pos=place(jnp.copy(pos_s), sh2),
            order=place(lists.order, rep),
            inv_order=place(lists.inv_order, rep))
        return WindowBHState(
            place(pos_s, sh2), place(vel_s, sh2), place(mass_s, sh1),
            lists,
            place(jnp.zeros_like(pos_s), sh2) if advance2 else None)

    return jax.jit(step, donate_argnums=(0,)), init_fn


def make_sharded_boids_step(config, n: int, mesh: Mesh, substeps: int = 1):
    """Sharded boids window engine: boids split by device over ``bodies``.

    Mirrors the reference Flock's per-frame pipeline (``boids/flock.py:
    610-678``) at multi-chip scale with the same collective shapes as the
    n-body window engine (:func:`make_sharded_window_step`):

      * state lives PASS-1-MORTON-SORTED; device d owns the contiguous
        sorted slot range ``[d·n/D, (d+1)·n/D)`` (spatially coherent);
      * per substep, pass 1 runs on local slots after a ±``window_groups``
        HALO EXCHANGE — two non-cyclic ``ppermute`` hops carrying the
        ``wg·group_size`` edge slots' 9 state rows each (the Morton
        window is the only cross-shard data pass 1 needs).  Edge devices'
        missing halos are filled with the single-chip far-away constants;
      * pass 2 (the diagonally-shifted dedup pass) permutes GLOBALLY by
        construction, so it rides one ``all_gather`` of the 9-row state:
        each device evaluates only its slice of pass-2 slots and one
        ``all_gather`` of the 14 accumulator rows routes them back to
        pass-1 owners;
      * every ``resort_interval`` steps both frozen orders rebuild from an
        all-gathered state (replicated argsort, exactly the single-chip
        :func:`~spatialsim_tpu.ops.boids_ops.build_boids_orders`), and
        each device re-slices its shard — identical to the n-body
        rebuild's ``gather_rep`` path;
      * physics (walls, clamps, colour blend) is elementwise-local.

    Determinism: every pair set and contraction order matches the
    single-chip :func:`~spatialsim_tpu.ops.boids_ops.
    flocking_forces_window_frozen`, so 1-chip and D-chip trajectories
    agree to f32 tolerance (tests/test_sharded.py).

    Returns ``(jitted_step, init_fn)``; ``init_fn(pos, vel, col)``
    (original boid order) places a correctly-sharded
    :class:`~spatialsim_tpu.models.boids.BoidsWindowState`.
    """
    from spatialsim_tpu.models.boids import (
        BoidsWindowState, init_boids_window_state)
    from spatialsim_tpu.ops.boids_ops import (
        _merge_and_steer, _window_accumulate, boids_physics,
        build_boids_orders)

    axis = BODY_AXIS
    D = mesh.shape[axis]
    gsz = config.group_size
    if n % (D * gsz) != 0:
        raise ValueError("num_boids must divide evenly by devices*groups")
    nl = n // D
    wg = config.window_groups
    wg2 = getattr(config, "pass2_window_groups", 0) or wg
    pw = wg * gsz
    pw2 = wg2 * gsz
    second_pass = config.second_pass
    resort_interval = getattr(config, "resort_interval", 6)
    grid_kw = dict(cell_size=config.cell_size, grid_dim=config.grid_dim,
                   offset=config.bounds + config.cell_size)
    acc_kw = dict(gsz=gsz,
                  perception_sq=float(config.perception_radius) ** 2,
                  separation_sq=float(config.separation_radius) ** 2)
    wall_force = config.max_force * config.wall_weight

    def _flat14(acc):
        sep, sep_count, align, coh, csum, nb_count = acc
        return jnp.concatenate(
            [jnp.moveaxis(a, 0, 1).reshape(3, -1)
             for a in (sep, align, coh, csum)]
            + [sep_count.reshape(1, -1).astype(jnp.float32),
               nb_count.reshape(1, -1).astype(jnp.float32)], axis=0)

    def step_local(pos_l, vel_l, col_l, p21, s21, order1, inv1, ss, dt):
        dev = jax.lax.axis_index(axis)

        def substep(carry, _):
            pos_l, vel_l, col_l, p21, s21, order1, inv1, ss = carry

            def do_resort(args):
                pos_l, vel_l, col_l, p21, s21, order1, inv1, ss = args
                sf = jax.lax.all_gather(
                    jnp.concatenate([pos_l, vel_l, col_l], axis=0),
                    axis, axis=1, tiled=True)               # (9, n)
                o1, p21n, s21n = build_boids_orders(
                    sf[0:3], group_size=gsz, **grid_kw)
                order1n = order1[o1]
                o1_inv = jnp.zeros((n,), jnp.int32).at[o1].set(
                    jnp.arange(n, dtype=jnp.int32))
                inv1n = o1_inv[inv1]
                s9 = jax.lax.dynamic_slice_in_dim(
                    sf[:, o1], dev * nl, nl, axis=1)
                return (s9[0:3], s9[3:6], s9[6:9], p21n, s21n,
                        order1n, inv1n, jnp.int32(0))

            (pos_l, vel_l, col_l, p21, s21, order1, inv1, ss) = (
                jax.lax.cond(
                    ss >= resort_interval, do_resort, lambda a: a,
                    (pos_l, vel_l, col_l, p21, s21, order1, inv1, ss)))

            # Pass 1: ±wg halo exchange (rows [vel, pos, col] to match
            # _window_accumulate's S9 stack).  Non-cyclic; the outermost
            # devices' missing halos get the single-chip edge constants
            # (pos 2e9 so they never pass the perception test — boids
            # carry no mass to neutralize a zero like n-body padding).
            s9 = jnp.concatenate([vel_l, pos_l, col_l], axis=0)
            from_left = jax.lax.ppermute(
                s9[:, -pw:], axis, [(i, i + 1) for i in range(D - 1)])
            from_right = jax.lax.ppermute(
                s9[:, :pw], axis, [(i + 1, i) for i in range(D - 1)])
            far9 = jnp.concatenate(
                [jnp.zeros((3, pw), jnp.float32),
                 jnp.full((3, pw), 2e9, jnp.float32),
                 jnp.zeros((3, pw), jnp.float32)], axis=0)
            hl = jnp.where(dev > 0, from_left, far9)
            hr = jnp.where(dev < D - 1, from_right, far9)
            acc1 = _window_accumulate(
                pos_l, vel_l, col_l, None, wg=wg, halo9=(hl, hr),
                **acc_kw)
            rows = _flat14(acc1)                            # (14, nl)

            if second_pass:
                sf = jax.lax.all_gather(s9, axis, axis=1, tiled=True)
                # This device's pass-2 slots plus wg2 halo groups on each
                # side, all gathered from the full pass-1-layout state in
                # one packed gather.  Out-of-range halo slots (global
                # pass-2 ends) collapse to the far-away fill.
                k2 = dev * nl + jnp.arange(-pw2, nl + pw2,
                                           dtype=jnp.int32)
                valid = (k2 >= 0) & (k2 < n)
                p21w = jnp.where(valid, p21[jnp.clip(k2, 0, n - 1)], 0)
                P2 = sf[:, p21w]                            # (9, nl+2pw2)
                P2 = jnp.where(valid[None, :], P2, 0.0)
                P2 = P2.at[3:6].set(
                    jnp.where(valid[None, :], P2[3:6], 2e9))
                g1f = jnp.where(valid, (p21w // gsz).astype(jnp.float32),
                                1e9)[None, :]
                acc2 = _window_accumulate(
                    P2[3:6, pw2:pw2 + nl], P2[0:3, pw2:pw2 + nl],
                    P2[6:9, pw2:pw2 + nl], g1f[:, pw2:pw2 + nl],
                    wg=wg2, prev_wg=wg,
                    halo9=(P2[:, :pw2], P2[:, nl + pw2:]),
                    halo_grpf=(g1f[:, :pw2], g1f[:, nl + pw2:]),
                    **acc_kw)
                rows2_f = jax.lax.all_gather(
                    _flat14(acc2), axis, axis=1, tiled=True)  # (14, n)
                s21_l = jax.lax.dynamic_slice_in_dim(s21, dev * nl, nl)
                rows = rows + rows2_f[:, s21_l]

            force, avg_col = _merge_and_steer(
                rows[0:3], rows[12].astype(jnp.int32), rows[3:6],
                rows[6:9], rows[9:12], rows[13].astype(jnp.int32),
                pos_l, vel_l, col_l,
                config.separation_weight, config.alignment_weight,
                config.cohesion_weight, config.max_speed,
                config.max_force)
            blend = jnp.minimum(1.0, config.color_blend_rate * dt)
            pos2, vel2, col2 = boids_physics(
                pos_l, vel_l, col_l, force, avg_col,
                bounds=config.bounds, margin=config.wall_margin,
                wall_force=wall_force, max_speed=config.max_speed,
                color_blend=blend, dt=dt)
            return (pos2, vel2, col2, p21, s21, order1, inv1,
                    ss + 1), None

        init = (pos_l, vel_l, col_l, p21, s21, order1, inv1, ss)
        out, _ = jax.lax.scan(substep, init, None, length=substeps)
        return out

    sh2 = P(None, axis)
    rep = P()
    in_specs = (sh2, sh2, sh2, rep, rep, rep, rep, rep, rep)
    out_specs = (sh2, sh2, sh2, rep, rep, rep, rep, rep)
    try:
        smapped = shard_map(step_local, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_rep=False)
    except TypeError:  # newer jax renamed the replication check
        smapped = shard_map(step_local, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)

    def step(state: "BoidsWindowState", dt):
        pos, vel, col, p21, s21, order1, inv1, ss = smapped(
            state.pos, state.vel, state.col, state.p21, state.s21,
            state.order1, state.inv1, state.steps_since, dt)
        return BoidsWindowState(pos, vel, col, order1, inv1, p21, s21,
                                ss)

    def init_fn(pos, vel, col):
        st = init_boids_window_state(pos, vel, col, config)
        place = lambda a, spec: jax.device_put(  # noqa: E731
            a, NamedSharding(mesh, spec))
        return BoidsWindowState(
            place(st.pos, sh2), place(st.vel, sh2), place(st.col, sh2),
            place(st.order1, rep), place(st.inv1, rep),
            place(st.p21, rep), place(st.s21, rep),
            place(st.steps_since, rep))

    return jax.jit(step, donate_argnums=(0,)), init_fn


def make_sharded_step(config, n: int, mesh: Mesh, substeps: int = 1,
                      engine: Optional[str] = None):
    """Jitted sharded step: (state, dt) -> state, bodies sharded over mesh.

    ``engine``: "allpairs" (ring) or "barnes_hut"; default picks by
    ``config.allpairs_threshold`` like the single-chip model
    (mirroring the reference's backend thresholds,
    ``nbody/gpu_backend.py:615-679``).
    """
    if n % mesh.shape[BODY_AXIS] != 0:
        raise ValueError("num_bodies must divide evenly across devices")
    if engine is None:
        engine = ("allpairs" if n <= config.allpairs_threshold
                  else "barnes_hut")

    if engine == "allpairs":
        def accel(state):
            return ring_allpairs_accel(state.pos, state.mass, mesh,
                                       config.G, config.softening)
    elif engine == "barnes_hut":
        def accel(state):
            return sharded_barnes_hut_accel(state.pos, state.mass, mesh,
                                            config)
    else:
        raise ValueError(f"unknown engine {engine!r}")

    damping = config.damping

    def step(state, dt):
        def body(s, _):
            acc = accel(s)
            pos, vel = integrate(s.pos, s.vel, acc, dt, damping)
            return type(s)(pos, vel, s.mass), None
        state, _ = jax.lax.scan(body, state, None, length=substeps)
        return state

    from spatialsim_tpu.models.nbody import NBodyState
    sh2 = NamedSharding(mesh, P(None, BODY_AXIS))
    sh1 = NamedSharding(mesh, P(BODY_AXIS))
    state_sh = NBodyState(pos=sh2, vel=sh2, mass=sh1)
    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(state_sh, None),
                   out_shardings=state_sh)
