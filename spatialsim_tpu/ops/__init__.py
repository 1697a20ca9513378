"""Compute kernels (L2) — jitted XLA programs and Pallas TPU kernels.

This layer replaces the reference's entire "native" compute tier: the Numba
``@njit`` CPU kernels (reference ``nbody/simulation.py:38-434``,
``boids/flock.py:16-448``), the numba.cuda PTX kernels
(``nbody/gpu_backend.py:139-333``), and the Metal shaders
(``nbody/metal/barnes_hut.metal``).  Everything here is shape-static and
traceable, so a whole multi-substep frame compiles to a single XLA program
with state resident in HBM.
"""

from spatialsim_tpu.ops.integrator import integrate  # noqa: F401
from spatialsim_tpu.ops.colors import colors_by_velocity  # noqa: F401
from spatialsim_tpu.ops.bounds import compute_bounds  # noqa: F401
from spatialsim_tpu.ops.allpairs import allpairs_accel, allpairs_accel_reference  # noqa: F401
