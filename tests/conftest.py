"""Test environment: hermetic 8-virtual-device CPU mesh.

The reference has no tests at all (SURVEY.md §4); this suite is new.  Tests
run on the CPU backend with 8 simulated devices so sharding tests exercise
real multi-device programs without a TPU pod — the TPU analogue of
"multi-node testing without a cluster".  Benchmarks (bench.py) run on the
real chip instead.
"""

import os

# Must be set before the backend initializes.  NOTE: this image pre-imports
# jax from sitecustomize with JAX_PLATFORMS=axon (the TPU tunnel), so the
# env var alone is too late — jax.config.update below is what actually
# forces the hermetic CPU backend for tests.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is compile-dominated (~20 min
# cold); warm runs reuse the cached executables.
jax.config.update("jax_compilation_cache_dir", "/tmp/spatialsim_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
