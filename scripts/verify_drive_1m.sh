#!/bin/bash
# Production-scale verify drive (VERDICT r4 #8): the full recorder loop
# at 1M bodies — record -> SIGINT mid-run -> --resume -> --extend ->
# delta-chain decode — so capture overlap, compressor backlog and the
# checkpoint cadence are exercised at the scale the framework claims.
# Chip-exclusive; rides the serialized chip queue.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/tpu_jit_cache
REC=/tmp/verify_rec_1m
NAME=verify_1m
rm -rf "$REC"

echo "=== record 100 frames @1M bar_galaxy (will interrupt ~frame 40)"
SPATIALSIM_RECORDINGS=$REC python -m spatialsim_tpu.tools.record \
  --preset bar_galaxy --bodies 1m --frames 100 --name $NAME &
PID=$!
# Interrupt AFTER compile: poll the staged frame count.
for i in $(seq 1 240); do
  sleep 10
  if ! kill -0 $PID 2>/dev/null; then break; fi
  NFR=$(ls "$REC/$NAME"/frame_* 2>/dev/null | wc -l)
  echo "  t=$((i*10))s frames_on_disk=$NFR"
  if [ "$NFR" -ge 40 ]; then
    echo "=== SIGINT at t=$((i*10))s"
    kill -INT $PID
    break
  fi
done
wait $PID
echo "record rc=$? (interrupt path)"

echo "=== status"
SPATIALSIM_RECORDINGS=$REC python -m spatialsim_tpu.tools.record --status

echo "=== resume to 100"
SPATIALSIM_RECORDINGS=$REC timeout 1200 python -m spatialsim_tpu.tools.record \
  --resume $NAME || exit 1

echo "=== extend +20"
SPATIALSIM_RECORDINGS=$REC timeout 1200 python -m spatialsim_tpu.tools.record \
  --extend 20 $NAME || exit 1

echo "=== decode check (delta chain to the final frame)"
python - << 'EOF' || exit 1
import numpy as np
from spatialsim_tpu.io import codec
p, c = codec.load_frame('/tmp/verify_rec_1m/verify_1m', 119)
assert np.isfinite(p).all(), "positions not finite"
assert c.min() >= -1e-3 and c.max() <= 1.0 + 1e-3, "colors out of range"
print(f"decode OK: frame 119, {p.shape[0]} bodies")
EOF
du -sh "$REC/$NAME"
echo "VERIFY DRIVE 1M OK"
