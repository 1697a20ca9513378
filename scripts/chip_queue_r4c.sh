#!/bin/bash
# Round-4 chip evidence queue, phase C (launched at the extreme_20m
# boundary).  Adds: bench10m rerun (now with the pool default — ranges
# alone still exhausted HBM at 10M), fixed decide16, the decide18
# probe battery (gates traversal-kernel v4), then the remaining long
# evidence runs and the kernel A/B, and a final full bench.
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

run_job bench10m       3600 python bench.py --only 10m
run_job decide19_gather 2400 python scripts/decide19.py
run_job decide16_boids 3600 python scripts/decide16.py
run_job decide18_prims 3600 python scripts/decide18.py
run_job extreme_20m    7200 python scripts/extreme_run.py 20000000 30
run_job quad_scan_10m  7200 python scripts/quad_scan.py 10000000
run_job extreme_50m    9000 python scripts/extreme_run.py 50000000 20
run_job extreme_10m    5400 python scripts/extreme_run.py 10000000 40 1.2
run_job decide17_1m    5400 python scripts/decide17.py 1000000
run_job bench_final    7200 python bench.py
echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
