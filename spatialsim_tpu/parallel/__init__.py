"""Multi-chip parallelism: GSPMD sharding over a ``bodies`` mesh axis.

The reference is single-process / single-GPU (SURVEY.md §2 checklist); this
layer is the TPU-native capability it lacks: data parallelism over bodies
via ``jax.sharding`` + ``shard_map``, with XLA collectives over ICI —
ring ``ppermute`` exchange for the all-pairs path (blockwise interaction,
the gravity analogue of ring attention) and ``all_gather`` tree replication
for Barnes-Hut.
"""

from spatialsim_tpu.parallel.mesh import make_mesh  # noqa: F401
from spatialsim_tpu.parallel.sharded import (  # noqa: F401
    ring_allpairs_accel, sharded_barnes_hut_accel, make_sharded_step,
    shard_state)
