#!/bin/bash
# Round-4 chip evidence queue, phase D: EXTREME reruns with the
# overflow-fold / unpadded-gather / order-1 fixes, plus the 10M
# pooled-vs-dense accuracy A/B that diagnoses the garbage error
# sample from the first 10M run.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/tpu_jit_cache
LOGDIR=docs/measurements_r4
mkdir -p "$LOGDIR"

run_job() {
  local name="$1" tmo="$2"; shift 2
  local log="$LOGDIR/$name.log"
  if [ -f "$log.done" ]; then echo "[queue] $name already done, skip"; return; fi
  echo "[queue] START $name: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$log" 2>&1
  local rc=$?
  echo "rc=$rc" >> "$log"
  echo "[queue] END $name rc=$rc $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ]; then touch "$log.done"; fi
}

# 10M accuracy A/B at the BASELINE theta=0.8 cluster shape: pooled
# (production default) vs dense far — few steps, the error sample and
# the pool diagnostics are the point.
run_job x10m_pool_diag 5400 python scripts/extreme_run.py 10000000 6 0.8
run_job x10m_dense_diag 5400 python scripts/extreme_run.py 10000000 6 0.8 0
run_job extreme_20m_v2 7200 python scripts/extreme_run.py 20000000 30
run_job quad_scan_10m_v2 7200 python scripts/quad_scan.py 10000000
run_job extreme_50m_v2 9000 python scripts/extreme_run.py 50000000 20
run_job extreme_10m_v2 5400 python scripts/extreme_run.py 10000000 40 1.2
echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
