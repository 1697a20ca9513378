"""Phase-isolated 10M diagnostic: find WHERE the bench 10m leg dies.

BENCH_r04 and the round-5 probe both lost the 10M metric to
RESOURCE_EXHAUSTED surfacing at the first warmup sync — an async error
that hides whether the HBM blowup is in (a) the calibration probes,
(b) init_window_state's first build, (c) the eval chain, or (d) the
periodic rebuild program.  This script runs the exact bench path one
phase at a time with a hard sync + wall time after each, plus an
analytic ledger of every static allocation the engine makes, so the
failing phase AND the budget math are both on record.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/diag10m.py \
    [n] [budget_override] [pool_tile_override]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jit_cache")

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    budget = int(float(sys.argv[2])) if len(sys.argv) > 2 else 0
    ptile = int(sys.argv[3]) if len(sys.argv) > 3 else -1

    from spatialsim_tpu.config.nbody import NBodyConfig, resolve_config
    from spatialsim_tpu.models.nbody import make_step_fn
    from spatialsim_tpu import distributions
    from spatialsim_tpu.ops import bh_window as bw
    from spatialsim_tpu.ops.octree import level_capacity

    t0 = time.time()
    cfg = NBodyConfig(num_bodies=n, theta=0.8, G=0.1, softening=2.0,
                      damping=1.0, spawn_radius=500.0,
                      distribution="cluster", engine="window",
                      rebuild_interval=24)
    if budget:
        cfg = cfg.replace(worklist_budget=budget)
    if ptile >= 0:
        cfg = cfg.replace(pool_tile=ptile)
    cfg = resolve_config(cfg, n)
    print(f"platform={jax.devices()[0].platform} n={n:,} depth="
          f"{cfg.max_depth} gsz={cfg.group_size} L={cfg.list_capacity} "
          f"pool={cfg.pool_tile} emit={cfg.traversal_emit} "
          f"adv={cfg.advance_order}", flush=True)

    pos, vel, mass = distributions.generate_distribution(
        "cluster", n, cfg.spawn_radius, cfg.G, seed=0)
    pos = jnp.asarray(pos.T, jnp.float32)
    vel = jnp.asarray(vel.T, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    print(f"[{time.time()-t0:7.1f}s] ICs on device", flush=True)

    if os.environ.get("EXTREME_SKIP_CALIBRATE") == "1":
        # Reproduce the EXTREME ladder path exactly (extreme_run.py
        # skips calibration above 20M — the probes are their own
        # OOM/time risk at 50M); the analytic ledger below still
        # prints, so a first-build OOM gets localized WITH its budget
        # math on record.
        print(f"[{time.time()-t0:7.1f}s] calibrate skipped (EXTREME)",
              flush=True)
    else:
        try:
            cfg = bw.calibrate_config(cfg, pos, vel, mass)
            print(f"[{time.time()-t0:7.1f}s] calibrate OK", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{time.time()-t0:7.1f}s] calibrate FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            return 2
    print(f"  tree_caps={list(getattr(cfg, 'tree_caps', ()) or ())}",
          flush=True)
    print(f"  wl_caps={list(getattr(cfg, 'wl_caps', ()) or ())}",
          flush=True)

    # ---- analytic static-allocation ledger --------------------------
    kw = bw._build_kw(cfg)
    gsz = kw["group_size"]
    npad = ((n + gsz - 1) // gsz) * gsz
    ng = npad // gsz
    n_levels = kw["max_depth"] - 2 + 1
    bud = kw["worklist_budget"] or bw._auto_budget(npad)
    wl_caps = (tuple(kw.get("wl_caps", ())) or
               bw._default_wl_caps(ng, n_levels, bud,
                                   c0=level_capacity(2, npad)))
    tree_caps = tuple(kw.get("tree_caps", ()) or
                      (level_capacity(li + 2, npad)
                       for li in range(n_levels)))
    GB = 1 << 30
    state_b = (3 * 3 * npad + 3 * n + 2 * npad + 2 * npad + n) * 4.0
    tree_b = sum(tree_caps) * 4.0 * 18     # ~18 attr cols incl. comp rows
    wl_live = max(wl_caps) * 4.0 * 34      # gathered cols on the fat level
    ranges_b = sum(wl_caps) * 4.0 * 2
    tile = kw["pool_tile"] or 0
    pool_b = 0.0
    if tile:
        cap_tiles = bw.pool_cap_tiles(bud, ng, tile, npad,
                                      caps_total=sum(wl_caps))
        pool_b = cap_tiles * 16 * tile * 4.0
        print(f"  pool cap_tiles={cap_tiles}", flush=True)
    L = kw["list_cap"]
    dense_far = 0 if tile else ng * 10 * L * 4.0
    print(f"  HBM ledger: state={state_b/GB:.2f} tree={tree_b/GB:.2f} "
          f"wl_live~={wl_live/GB:.2f} ranges={ranges_b/GB:.2f} "
          f"pool={pool_b/GB:.2f} dense_far={dense_far/GB:.2f} "
          f"sum~={(state_b+tree_b+wl_live+ranges_b+pool_b+dense_far)/GB:.2f} "
          f"GB (usable 15.75)", flush=True)

    # ---- phases ------------------------------------------------------
    chain = 24
    step = make_step_fn(cfg, n, substeps=chain, engine="window")
    try:
        state = bw.init_window_state(pos, vel, mass, cfg)
        sync(state.pos)
        print(f"[{time.time()-t0:7.1f}s] init_window_state OK", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{time.time()-t0:7.1f}s] init FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return 3
    del pos, vel, mass

    dt = jnp.float32(0.02)
    for i in range(4):
        label = ("eval-chain" if int(state.lists.steps_build) < 24
                 else "rebuild+chain")
        try:
            t1 = time.time()
            state = step(state, dt)
            sync(state.pos)
            print(f"[{time.time()-t0:7.1f}s] dispatch {i} ({label}) OK "
                  f"{time.time()-t1:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{time.time()-t0:7.1f}s] dispatch {i} ({label}) "
                  f"FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
            return 4
    # steady-state rate over 2 more dispatches
    t1 = time.time()
    for _ in range(2):
        state = step(state, dt)
        sync(state.pos)
    rate = 2 * chain / (time.time() - t1)
    print(f"[{time.time()-t0:7.1f}s] sustained {rate:.2f} steps/s "
          f"({1000.0/rate:.0f} ms/step)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
