"""Simulation models (L3): NBodySimulation and Flock.

The TPU equivalents of the reference's ``nbody/simulation.py:441`` and
``boids/flock.py:454`` model classes — but here the models are thin hosts
around pure jitted step programs; all state lives in device HBM as pytrees.
"""

from spatialsim_tpu.models.nbody import NBodySimulation, NBodyState  # noqa: F401
from spatialsim_tpu.models.boids import Flock, BoidsState  # noqa: F401
