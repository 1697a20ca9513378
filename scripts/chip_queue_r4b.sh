#!/bin/bash
# Round-4 chip evidence queue, phase B (reordered after the staleness
# r12 result landed).  One job at a time; continues past failures;
# .done files make restarts idempotent.  Order: the fast decision-makers
# first (kernel-primitive probes, 10M ranges-fix validation, pool
# validation), then the end-to-end verify drive, then the long EXTREME
# evidence runs, then the traversal-kernel A/B last (so the rewritten
# kernel can land before it fires).
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

run_job decide15v2     2400 python scripts/decide15.py
run_job bench10m       3600 python bench.py --only 10m
run_job staleness_o2_r0  5400 python scripts/staleness_scan.py 1000000 2.0 2 256 0
run_job decide14_pool  5400 python scripts/decide14.py 1000000 2
run_job decide16_boids 3600 python scripts/decide16.py
run_job verify_drive   3600 bash scripts/verify_drive.sh
run_job extreme_20m    7200 python scripts/extreme_run.py 20000000 30
run_job quad_scan_10m  7200 python scripts/quad_scan.py 10000000
run_job extreme_50m    9000 python scripts/extreme_run.py 50000000 20
run_job extreme_10m    5400 python scripts/extreme_run.py 10000000 40 1.2
run_job decide17_1m    5400 python scripts/decide17.py 1000000
echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
