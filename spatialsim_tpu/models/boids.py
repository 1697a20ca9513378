"""Boids flocking model.

TPU-native equivalent of the reference ``Flock`` (``boids/flock.py:454-782``):
the spatial grid, flocking forces, wall springs and colour blending all run
as one jitted XLA program per frame (see ``spatialsim_tpu/ops/boids_ops.py``);
the host only pulls positions/colours for rendering or recording.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spatialsim_tpu.config.boids import BoidsConfig, BOIDS
from spatialsim_tpu.ops.boids_ops import flocking_forces, boids_physics


class BoidsState(NamedTuple):
    """pos/vel/col: (3, N) float32 pytree resident on device."""

    pos: jax.Array
    vel: jax.Array
    col: jax.Array


class BoidsWindowState(NamedTuple):
    """Production (window-mode) state: PASS-1-MORTON-SORTED arrays plus
    the frozen order pair, re-sorted every ``resort_interval`` steps.

    ``order1``: (n,) sorted slot -> ORIGINAL boid id (host-facing reads
    map back through ``inv1``); ``p21``/``s21``: the second window
    pass's permutation relative to the pass-1 layout (see
    ops/boids_ops.py:flocking_forces_window_frozen).
    """

    pos: jax.Array
    vel: jax.Array
    col: jax.Array
    order1: jax.Array
    inv1: jax.Array
    p21: jax.Array
    s21: jax.Array
    steps_since: jax.Array


def generate_rainbow_colors(count: int, rng: np.random.Generator) -> np.ndarray:
    """Shuffled evenly-spaced hues at S=0.9, V=1.0 (flock.py:587-608)."""
    hues = np.linspace(0, 1, count, endpoint=False)
    rng.shuffle(hues)
    s, v = 0.9, 1.0
    h6 = hues * 6.0
    i = h6.astype(np.int32) % 6
    f = h6 - np.floor(h6)
    p = np.full_like(f, v * (1.0 - s))
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    vv = np.full_like(f, v)
    table = [(vv, t, p), (q, vv, p), (p, vv, t), (p, q, vv), (t, p, vv), (vv, p, q)]
    colors = np.zeros((count, 3))
    for idx, (r_, g_, b_) in enumerate(table):
        m = i == idx
        colors[m, 0], colors[m, 1], colors[m, 2] = r_[m], g_[m], b_[m]
    return colors


def resolve_neighbor_mode(config: BoidsConfig) -> str:
    mode = getattr(config, "neighbor_mode", "auto")
    if mode != "auto":
        return mode
    return ("grid" if config.num_boids <= config.window_threshold
            else "window")


def _resort_boids(state: BoidsWindowState, grid_kw, gsz):
    """Re-sort the (nearly sorted) state and compose the original-id maps."""
    from spatialsim_tpu.ops.boids_ops import build_boids_orders
    n = state.pos.shape[1]
    o1, p21, s21 = build_boids_orders(state.pos, group_size=gsz, **grid_kw)
    pos = state.pos[:, o1]
    vel = state.vel[:, o1]
    col = state.col[:, o1]
    order1 = state.order1[o1]
    o1_inv = jnp.zeros((n,), jnp.int32).at[o1].set(
        jnp.arange(n, dtype=jnp.int32))
    inv1 = o1_inv[state.inv1]
    return BoidsWindowState(pos, vel, col, order1, inv1, p21, s21,
                            jnp.int32(0))


def init_boids_window_state(pos, vel, col, config) -> BoidsWindowState:
    """Sort ORIGINAL-order arrays into the frozen-order window state."""
    from spatialsim_tpu.ops.boids_ops import build_boids_orders
    n = pos.shape[1]
    grid_kw = dict(cell_size=config.cell_size, grid_dim=config.grid_dim,
                   offset=config.bounds + config.cell_size)
    o1, p21, s21 = build_boids_orders(pos, group_size=config.group_size,
                                      **grid_kw)
    inv1 = jnp.zeros((n,), jnp.int32).at[o1].set(
        jnp.arange(n, dtype=jnp.int32))
    return BoidsWindowState(pos[:, o1], vel[:, o1], col[:, o1], o1, inv1,
                            p21, s21, jnp.int32(0))


def make_step_fn(config: BoidsConfig, substeps: int = 1):
    """Build the jitted flock step: (state, dt) -> state.

    ``substeps`` chains that many physics steps inside one dispatch
    (``lax.scan``) — the benchmark/recorder path; interactive use keeps 1.
    Window mode takes/returns a :class:`BoidsWindowState` (Morton-sorted,
    frozen orders re-sorted every ``config.resort_interval`` steps); grid
    mode keeps the original-order :class:`BoidsState`.
    """
    import math

    from spatialsim_tpu.ops.boids_ops import flocking_forces_window_frozen

    mode = resolve_neighbor_mode(config)
    cell_range = int(math.ceil(config.perception_radius / config.cell_size))
    grid_dim = config.grid_dim
    grid_offset = config.bounds + config.cell_size  # flock.py:483
    wall_force = config.max_force * config.wall_weight  # flock.py:672
    resort_interval = getattr(config, "resort_interval", 6)

    force_kw = dict(
        perception_radius=config.perception_radius,
        separation_radius=config.separation_radius,
        separation_weight=config.separation_weight,
        alignment_weight=config.alignment_weight,
        cohesion_weight=config.cohesion_weight,
        max_speed=config.max_speed, max_force=config.max_force)
    grid_kw = dict(cell_size=config.cell_size, grid_dim=grid_dim,
                   offset=grid_offset)

    def physics(pos, vel, col, force, avg_col, dt):
        blend = jnp.minimum(1.0, config.color_blend_rate * dt)
        return boids_physics(
            pos, vel, col, force, avg_col,
            bounds=config.bounds, margin=config.wall_margin,
            wall_force=wall_force, max_speed=config.max_speed,
            color_blend=blend, dt=dt)

    if mode == "window":
        def substep(state: BoidsWindowState, dt):
            state = jax.lax.cond(
                state.steps_since >= resort_interval,
                lambda s: _resort_boids(s, grid_kw, config.group_size),
                lambda s: s, state)
            force, avg_col = flocking_forces_window_frozen(
                state.pos, state.vel, state.col, state.p21, state.s21,
                group_size=config.group_size,
                window_groups=config.window_groups,
                pass2_window_groups=getattr(config, "pass2_window_groups",
                                            0),
                second_pass=config.second_pass, **force_kw)
            pos, vel, col = physics(state.pos, state.vel, state.col,
                                    force, avg_col, dt)
            return state._replace(pos=pos, vel=vel, col=col,
                                  steps_since=state.steps_since + 1)
    else:
        def substep(state: BoidsState, dt):
            force, avg_col = flocking_forces(
                state.pos, state.vel, state.col,
                cell_range=cell_range,
                cell_capacity=config.cell_capacity, **grid_kw, **force_kw)
            pos, vel, col = physics(state.pos, state.vel, state.col,
                                    force, avg_col, dt)
            return BoidsState(pos, vel, col)

    if substeps == 1:
        return jax.jit(substep, donate_argnums=(0,))

    def step(state, dt):
        def body(s, _):
            return substep(s, dt), None
        state, _ = jax.lax.scan(body, state, None, length=substeps)
        return state

    return jax.jit(step, donate_argnums=(0,))


class Flock:
    """Host-side driver owning an on-device :class:`BoidsState`."""

    def __init__(self, num_boids: Optional[int] = None,
                 config: Optional[BoidsConfig] = None, seed: int = 0):
        self.config = config or BOIDS
        if num_boids is not None:
            self.config = self.config.replace(num_boids=num_boids)
        self.num_boids = self.config.num_boids
        rng = np.random.default_rng(seed)

        # Reference init: uniform positions in the box, uniform velocities
        # in [-max_speed/2, max_speed/2] (flock.py:488-489).
        b = self.config.bounds
        pos = (rng.random((self.num_boids, 3)) - 0.5) * 2 * b
        vel = (rng.random((self.num_boids, 3)) - 0.5) * self.config.max_speed
        col = generate_rainbow_colors(self.num_boids, rng)
        pos_d = jnp.asarray(pos.T, jnp.float32)
        vel_d = jnp.asarray(vel.T, jnp.float32)
        col_d = jnp.asarray(col.T, jnp.float32)
        self.neighbor_mode = resolve_neighbor_mode(self.config)
        if self.neighbor_mode == "window":
            self.state = init_boids_window_state(pos_d, vel_d, col_d,
                                                 self.config)
            self._unsort = jax.jit(lambda arr, inv: arr[:, inv])
        else:
            self.state = BoidsState(pos=pos_d, vel=vel_d, col=col_d)
            self._unsort = None
        self._step = make_step_fn(self.config)

    def update(self, dt: float):
        self.state = self._step(self.state, jnp.float32(dt))

    def _original(self, arr):
        if self._unsort is not None:
            return self._unsort(arr, self.state.inv1)
        return arr

    def get_positions(self) -> np.ndarray:
        return np.asarray(self._original(self.state.pos)).T

    def get_velocities(self) -> np.ndarray:
        return np.asarray(self._original(self.state.vel)).T

    def get_colors(self) -> np.ndarray:
        return np.asarray(self._original(self.state.col)).T
