"""Profiling and step instrumentation.

TPU-native replacement for the reference's wall-clock-only tooling (frame
time rings + ETA, ``tools/record.py:878-888``; FPS HUD): the same cheap
counters, plus real device traces via ``jax.profiler`` viewable in
TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


class StepTimer:
    """Moving-average step timer with ETA (reference's 10-frame ring)."""

    def __init__(self, window: int = 10):
        self.times = deque(maxlen=window)
        self.total_steps = 0
        self.started = time.time()
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.times.append(time.time() - self._t0)
        self.total_steps += 1

    @property
    def avg(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.avg if self.avg else 0.0

    def eta(self, remaining_steps: int) -> float:
        return self.avg * remaining_steps

    def elapsed(self) -> float:
        return time.time() - self.started


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/spatialsim_trace"):
    """Capture a device trace: ``with trace(): sim.update(dt)``.

    Open the directory with TensorBoard's profile plugin or upload the
    ``.trace.json.gz`` to Perfetto.
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def profile_step(fn, *args, iters: int = 3, log_dir: Optional[str] = None):
    """Time a jitted step accurately (forces a host sync per iteration;
    on the axon tunnel platform ``block_until_ready`` alone can return
    early on chained dispatches — see .claude/skills/verify/SKILL.md)."""
    import jax
    import numpy as np

    def sync(value):
        leaf = jax.tree_util.tree_leaves(value)[0]
        np.asarray(leaf).ravel()[:1]

    out = fn(*args)
    sync(out)
    times = []
    ctx = trace(log_dir) if log_dir else contextlib.nullcontext()
    with ctx:
        for _ in range(iters):
            t0 = time.time()
            out = fn(*args)
            sync(out)
            times.append(time.time() - t0)
    return min(times), out
