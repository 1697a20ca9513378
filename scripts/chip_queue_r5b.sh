#!/bin/bash
# Round-5 session-2 chip evidence queue.  Serialized (one chip); a
# GLOBAL deadline guarantees the chip is free before the driver's
# end-of-round bench run.  Order = value per minute:
#   1. bench boids500k  — VERDICT #6 metric, quick, warms boids cache
#   2. bench 1m         — headline metric + warm cache for the driver
#   3. bench 10m        — the metric that OOM'd in r4; diag10m_v2 is
#                         green on this exact path post-fixes
#   4. extreme 50M/20   — the never-green headline capability (v6 cap
#                         fix validation; partial log still counts)
#   5. verify drive 1M  — VERDICT #8
#   6. staleness tau=32 — possible free interval flip
#   7. extreme 20M/30   — flatness check
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/tpu_jit_cache
LOGDIR=docs/measurements_r5
mkdir -p "$LOGDIR"

DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-2700} ))

run_job() {
  local name="$1" tmo="$2"; shift 2
  local log="$LOGDIR/$name.log"
  local now left
  now=$(date +%s); left=$(( DEADLINE - now ))
  if [ "$left" -le 60 ]; then echo "[queue] deadline, skip $name"; return; fi
  if [ "$tmo" -gt "$left" ]; then tmo=$left; fi
  if [ -f "$log.done" ]; then echo "[queue] $name already done, skip"; return; fi
  echo "[queue] START $name (timeout ${tmo}s) $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$log" 2>&1
  local rc=$?
  echo "rc=$rc" >> "$log"
  echo "[queue] END $name rc=$rc $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ]; then touch "$log.done"; fi
}

run_job bench_boids500k 700 python bench.py --only boids500k
run_job bench_1m_v2 1200 python bench.py --only 1m
run_job bench_10m_v3 1800 python bench.py --only 10m
run_job extreme_50m_v6 1800 python scripts/extreme_run.py 50000000 20
run_job verify_drive_1m 1800 bash scripts/verify_drive_1m.sh
run_job staleness_tau32 1500 python scripts/staleness_scan.py 1000000 6.0 2 256 0 0,32
run_job extreme_20m_v3 2400 python scripts/extreme_run.py 20000000 30
echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
