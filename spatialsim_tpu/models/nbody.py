"""N-body gravitational simulation model.

The TPU-native equivalent of the reference's ``NBodySimulation``
(``nbody/simulation.py:441-963``) and of its GPU backend zoo
(``nbody/gpu_backend.py``): instead of selecting a *device* backend at
runtime (CUDA / Metal-BH / MPS / CPU, reference ``gpu_backend.py:36-55``),
we select an *algorithm* — the tiled Pallas all-pairs kernel below an
N-threshold, the Barnes-Hut octree pipeline above it — and compile the whole
multi-substep frame into one XLA program.  State is a pytree resident in
device HBM; the host only sees it when a frame is captured.

Layout note: arrays are component-major ``(3, N)`` float32 so that the body
axis runs along TPU vector lanes; the host-facing getters return the
reference's ``(N, 3)`` layout.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spatialsim_tpu.config.nbody import NBodyConfig, NBODY, resolve_config
from spatialsim_tpu.ops.integrator import integrate
from spatialsim_tpu.ops.colors import colors_by_velocity
from spatialsim_tpu.ops.allpairs import allpairs_accel
from spatialsim_tpu import distributions


class NBodyState(NamedTuple):
    """Simulation state pytree.  pos/vel: (3, N) f32; mass: (N,) f32."""

    pos: jax.Array
    vel: jax.Array
    mass: jax.Array


def resolve_engine(config: NBodyConfig, n: int) -> str:
    """Pick the force engine for a given body count.

    Mirrors the reference's threshold-based backend factory
    (``nbody/gpu_backend.py:615-679``) with algorithms instead of devices:
    tiled all-pairs below the threshold, the amortized windowed Barnes-Hut
    (ops/bh_window.py) above it.  ``engine="exact"`` forces the per-step
    reference-parity traversal.
    """
    if config.engine != "auto":
        return config.engine
    return "allpairs" if n <= config.allpairs_threshold else "window"


def make_accel_fn(config: NBodyConfig, n: int, engine: str = None):
    config = resolve_config(config, n)
    engine = engine or resolve_engine(config, n)
    if engine == "window":
        raise ValueError("the window engine is stateful; use "
                         "make_window_step (models handle this)")
    if engine == "allpairs":
        def accel(state: NBodyState):
            return allpairs_accel(state.pos, state.mass, config.G,
                                  config.softening)
        return accel
    from spatialsim_tpu.ops.barnes_hut import barnes_hut_accel
    def accel(state: NBodyState):
        return barnes_hut_accel(state.pos, state.mass, config)
    return accel


def make_step_fn(config: NBodyConfig, n: int, substeps: int = 1,
                 engine: str = None):
    """Build a jitted multi-substep step: state, dt -> state.

    ``dt`` is the *per-substep* timestep (the recorder divides
    ``dt_per_frame`` by ``substeps``; reference ``tools/record.py:749``).
    The substep loop is a ``lax.scan`` so one dispatch covers a whole frame.
    For the windowed production engine the returned step takes/returns a
    ``WindowBHState`` instead (same pos/vel/mass leaves plus the lists).
    """
    config = resolve_config(config, n)
    engine = engine or resolve_engine(config, n)
    if engine == "window":
        from spatialsim_tpu.ops.bh_window import make_window_step
        return make_window_step(config, n, substeps)
    accel_fn = make_accel_fn(config, n, engine)
    damping = config.damping

    def step(state: NBodyState, dt):
        def body(s, _):
            acc = accel_fn(s)
            pos, vel = integrate(s.pos, s.vel, acc, dt, damping)
            return NBodyState(pos, vel, s.mass), None
        state, _ = jax.lax.scan(body, state, None, length=substeps)
        return state

    return jax.jit(step, donate_argnums=(0,))


class NBodySimulation:
    """Host-side driver owning an on-device :class:`NBodyState`.

    API mirrors the reference model (``nbody/simulation.py:441``):
    ``update(dt)``, ``get_positions()``, ``get_velocities()``,
    ``get_colors()``, plus ``state`` access for the recorder.
    """

    def __init__(self, num_bodies: Optional[int] = None,
                 config: Optional[NBodyConfig] = None, seed: int = 0,
                 substeps: int = 1):
        self.config = config or (
            NBODY if num_bodies is None else NBODY.replace(num_bodies=num_bodies))
        if num_bodies is not None:
            self.config = self.config.replace(num_bodies=num_bodies)
        self.num_bodies = self.config.num_bodies
        self.substeps = substeps

        pos, vel, mass = distributions.generate_distribution(
            self.config.distribution, self.num_bodies,
            self.config.spawn_radius, self.config.G, seed=seed)
        self._init_state(jnp.asarray(pos.T, jnp.float32),
                         jnp.asarray(vel.T, jnp.float32),
                         jnp.asarray(mass, jnp.float32))

    @classmethod
    def from_state(cls, positions, velocities, masses=None,
                   config: Optional[NBodyConfig] = None, substeps: int = 1):
        """Restore from host arrays (N,3)/(N,3)/(N,) — the resume path."""
        sim = cls.__new__(cls)
        n = positions.shape[0]
        sim.config = (config or NBODY).replace(num_bodies=n)
        sim.num_bodies = n
        sim.substeps = substeps
        if masses is None:
            masses = np.ones(n)
        sim._init_state(jnp.asarray(np.asarray(positions).T, jnp.float32),
                        jnp.asarray(np.asarray(velocities).T, jnp.float32),
                        jnp.asarray(masses, jnp.float32))
        return sim

    def _init_state(self, pos, vel, mass):
        """Build engine-appropriate device state + jitted step."""
        self.config = resolve_config(self.config, self.num_bodies)
        self.engine = resolve_engine(self.config, self.num_bodies)
        if self.engine == "window":
            from spatialsim_tpu.ops.bh_window import (calibrate_config,
                                                      init_window_state)
            # Demand-calibrate the worklist caps on the real initial
            # conditions: the default per-level caps follow the galaxy
            # demand profile, and a clamped level silently costs ~10%
            # median force error on dense isotropic distributions
            # (scripts/decide20.py).  No-op when the defaults fit.
            self.config = calibrate_config(self.config, pos, vel, mass)
            self.state = init_window_state(pos, vel, mass, self.config)
        else:
            self.state = NBodyState(pos=pos, vel=vel, mass=mass)
        self._step = make_step_fn(self.config, self.num_bodies,
                                  self.substeps, self.engine)
        self._colors = jax.jit(functools.partial(
            colors_by_velocity, max_speed=self.config.max_speed_color))
        self._color_cache = None
        if self.engine == "window":
            # The window state lives Morton-sorted (gather-free stepping);
            # one jitted gather maps back to original body order for the
            # host-facing getters and frame capture.
            self._unsort = jax.jit(lambda arr, inv: arr[:, inv])
        else:
            self._unsort = None

    def _original(self, arr):
        """Device array mapped to original body order (axis 1 = bodies)."""
        if self._unsort is not None:
            return self._unsort(arr, self.state.lists.inv_order)
        return arr

    def device_frame(self):
        """(pos, vel) device arrays, original body order — capture path.

        Stays on device so the recorder can overlap the host transfer
        with the next frame's compute.
        """
        return (self._original(self.state.pos),
                self._original(self.state.vel))

    def update(self, dt: float):
        """Advance one frame (dt capped at max_dt per the reference's
        ``simulation.py:802``; substeps run inside the jitted program)."""
        dt = min(float(dt), self.config.max_dt) if self.config.max_dt else float(dt)
        self.state = self._step(self.state, jnp.float32(dt))
        self._color_cache = None

    def step_raw(self, dt: float):
        """Advance without the interactive dt cap (offline recorder path)."""
        self.state = self._step(self.state, jnp.float32(dt))
        self._color_cache = None

    # --- host-facing getters (reference gpu_backend.py:394-409) ---
    def get_positions(self) -> np.ndarray:
        return np.asarray(self._original(self.state.pos)).T

    def get_velocities(self) -> np.ndarray:
        return np.asarray(self._original(self.state.vel)).T

    def get_colors(self) -> np.ndarray:
        if self._color_cache is None:
            self._color_cache = np.asarray(
                self._colors(self._original(self.state.vel))).T
        return self._color_cache

    def get_masses(self) -> np.ndarray:
        if self._unsort is not None:
            return np.asarray(self.state.mass[self.state.lists.inv_order])
        return np.asarray(self.state.mass)
