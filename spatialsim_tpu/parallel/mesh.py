"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


BODY_AXIS = "bodies"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis: str = BODY_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices.

    Bodies are the only large axis in this workload, so a 1-D mesh is the
    natural layout; ICI neighbours in the ring carry the ppermute traffic.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.array(devices), (axis,))
