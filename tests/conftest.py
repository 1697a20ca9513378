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

# The XLA CPU pipeline segfaults compiling the largest programs in this
# suite (window step with refresh machinery, big shard_map programs) —
# SIGSEGV inside backend_compile with 126 GB free, i.e. LLVM recursion
# overflowing the default 8 MB thread stack, not OOM.  Raise the limit
# BEFORE the first compile so lazily-created compiler threads inherit
# bigger stacks (glibc sizes thread stacks from RLIMIT_STACK at
# creation).
import resource  # noqa: E402

# The decisive limit (measured): this jax CPU build leaks ~300 memory
# mappings per compiled executable, and a full-suite process crosses the
# default vm.max_map_count of 65530 around test ~126 — mmap starts
# failing and LLVM SIGSEGVs (not OOM: 126 GB free at the crash).  Raise
# it when permitted (the suite runs as root in CI images).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 1_048_576:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("1048576")
except (OSError, ValueError):  # pragma: no cover - non-root/containers
    pass

try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _hard != resource.RLIM_INFINITY:
        _want = min(_want, _hard)
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
except (ValueError, OSError):  # pragma: no cover - restricted env
    pass

# Belt and braces for the same crash: this jax build's persistent-cache
# serializer also segfaulted writing LARGE executables in round 2.
# Cache READS are safe and stay enabled so warm artifacts still help;
# writes are stubbed out globally.  (test_sharded previously carried a
# module-local stub; the window step crossed the threshold too.)
from jax._src import compilation_cache as _cc  # noqa: E402


def _no_cache_write(*args, **kwargs):
    return None


_cc.put_executable_and_time = _no_cache_write


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
