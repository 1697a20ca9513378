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


def make_step_fn(config: BoidsConfig, substeps: int = 1):
    """Build the jitted flock step: (state, dt) -> state.

    ``substeps`` chains that many physics steps inside one dispatch
    (``lax.scan``) — the benchmark/recorder path; interactive use keeps 1.
    """
    import math

    from spatialsim_tpu.ops.boids_ops import flocking_forces_window

    mode = resolve_neighbor_mode(config)
    cell_range = int(math.ceil(config.perception_radius / config.cell_size))
    grid_dim = config.grid_dim
    grid_offset = config.bounds + config.cell_size  # flock.py:483
    wall_force = config.max_force * config.wall_weight  # flock.py:672

    common = dict(
        cell_size=config.cell_size, grid_dim=grid_dim, offset=grid_offset,
        perception_radius=config.perception_radius,
        separation_radius=config.separation_radius,
        separation_weight=config.separation_weight,
        alignment_weight=config.alignment_weight,
        cohesion_weight=config.cohesion_weight,
        max_speed=config.max_speed, max_force=config.max_force)

    def substep(state: BoidsState, dt):
        if mode == "window":
            force, avg_col = flocking_forces_window(
                state.pos, state.vel, state.col,
                group_size=config.group_size,
                window_groups=config.window_groups, **common)
        else:
            force, avg_col = flocking_forces(
                state.pos, state.vel, state.col,
                cell_range=cell_range,
                cell_capacity=config.cell_capacity, **common)
        blend = jnp.minimum(1.0, config.color_blend_rate * dt)
        pos, vel, col = boids_physics(
            state.pos, state.vel, state.col, force, avg_col,
            bounds=config.bounds, margin=config.wall_margin,
            wall_force=wall_force, max_speed=config.max_speed,
            color_blend=blend, dt=dt)
        return BoidsState(pos, vel, col)

    if substeps == 1:
        return jax.jit(substep, donate_argnums=(0,))

    def step(state: BoidsState, dt):
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
        self.state = BoidsState(
            pos=jnp.asarray(pos.T, jnp.float32),
            vel=jnp.asarray(vel.T, jnp.float32),
            col=jnp.asarray(col.T, jnp.float32),
        )
        self.neighbor_mode = resolve_neighbor_mode(self.config)
        self._step = make_step_fn(self.config)

    def update(self, dt: float):
        self.state = self._step(self.state, jnp.float32(dt))

    def get_positions(self) -> np.ndarray:
        return np.asarray(self.state.pos).T

    def get_velocities(self) -> np.ndarray:
        return np.asarray(self.state.vel).T

    def get_colors(self) -> np.ndarray:
        return np.asarray(self.state.col).T
