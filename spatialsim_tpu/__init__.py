"""spatialsim-tpu: TPU-native N-body gravity + boids flocking framework.

A ground-up JAX/XLA/Pallas re-design of
Keshav-Madhav/3d-spatial-sim-for-boid-and-nbody (see README.md for the
architecture).  Public surface:

    from spatialsim_tpu import NBodySimulation, Flock
    from spatialsim_tpu.presets import PRESETS, get_preset_config
    from spatialsim_tpu.distributions import generate_distribution
    from spatialsim_tpu.tools import record, playback, export
"""

__version__ = "0.1.0"

from spatialsim_tpu.distributions import (  # noqa: F401
    DISTRIBUTIONS, generate_distribution)


def __getattr__(name):
    # Lazy model imports keep `import spatialsim_tpu` light (no jax init).
    if name == "NBodySimulation":
        from spatialsim_tpu.models.nbody import NBodySimulation
        return NBodySimulation
    if name == "Flock":
        from spatialsim_tpu.models.boids import Flock
        return Flock
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
