"""spatialsim_tpu — a TPU-native 3D particle-simulation framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
application ``Keshav-Madhav/3d-spatial-sim-for-boid-and-nbody``:

* **N-body gravity** — Morton-sorted linear octree Barnes-Hut (O(N log N))
  plus a tiled Pallas all-pairs kernel for small N, semi-implicit Euler
  integration with optional damping, velocity heat-map colouring.
  (Reference: ``nbody/simulation.py``, ``nbody/gpu_backend.py``,
  ``nbody/metal/*``.)
* **Boids flocking** — separation / alignment / cohesion over a uniform
  spatial hash grid with soft wall springs and colour blending.
  (Reference: ``boids/flock.py``.)
* **Offline tools** — preset catalog, 25 initial-condition distributions,
  resumable/extendable frame recorder with zstd+delta compression, playback,
  and video export.  (Reference: ``tools/``.)

Unlike the reference (Numba/CUDA/Metal, single machine), all compute here is
expressed as jitted XLA programs with state resident in device HBM, sharded
across chips with ``jax.sharding`` for the 5-50M body EXTREME presets.
"""

__version__ = "0.1.0"

from spatialsim_tpu.models.nbody import NBodySimulation, NBodyState  # noqa: F401
from spatialsim_tpu.models.boids import Flock, BoidsState  # noqa: F401
