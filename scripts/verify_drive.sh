#!/bin/bash
# The /verify skill's on-chip drive: recorder CLI end-to-end on the real
# TPU (record -> status -> extend -> frame decode).  Chip-exclusive, so
# it rides the serialized chip queue.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/tpu_jit_cache
REC=/tmp/verify_rec_r4
rm -rf "$REC"

SPATIALSIM_RECORDINGS=$REC python -m spatialsim_tpu.tools.record \
  --preset tiny_galaxy --frames 30 --bodies 8k --name verify_tiny \
  || exit 1
SPATIALSIM_RECORDINGS=$REC python -m spatialsim_tpu.tools.record --status \
  || exit 1
SPATIALSIM_RECORDINGS=$REC python -m spatialsim_tpu.tools.record \
  --extend 60 verify_tiny || exit 1
python - << 'EOF' || exit 1
import numpy as np
from spatialsim_tpu.io import codec
p, c = codec.load_frame('/tmp/verify_rec_r4/verify_tiny', 59)
assert np.isfinite(p).all(), "positions not finite"
assert c.min() >= -1e-3 and c.max() <= 1.0 + 1e-3, "colors out of range"
print(f"decode OK: frame 59, {p.shape[1] if p.ndim == 2 else len(p)} bodies")
EOF
echo "VERIFY DRIVE OK"
