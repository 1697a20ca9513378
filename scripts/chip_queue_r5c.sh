#!/bin/bash
# Round-5 session-2 chip queue, corrected: waits for the r5b runner to
# drain (it exits after its in-flight job — the rest are sentinel-
# skipped), then runs the evidence ladder.  50M skips calibration:
# the v5/v6 EXTREME path uses _auto_budget caps; calibrate's probe
# builds at 50M are themselves an OOM/time risk
# (docs/measurements_r4/extreme_50m_v5.log, NOTES.md round-4 session 2).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/tpu_jit_cache
LOGDIR=docs/measurements_r5
mkdir -p "$LOGDIR"

# Wait for the r5b runner (and its in-flight bench) to exit.
if [ -f /tmp/queue_r5b.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5b.pid)" 2>/dev/null; do sleep 5; done
fi

# Drop sentinel-only .done markers (placed to make r5b skip its
# remaining jobs); a genuine .done always has its .log next to it.
for d in "$LOGDIR"/*.log.done; do
  [ -f "${d%.done}" ] || rm -f "$d"
done

DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-2460} ))

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

run_job bench_1m_v2 1200 python bench.py --only 1m
run_job bench_10m_v3 1800 python bench.py --only 10m
run_job extreme_50m_v6 1500 env EXTREME_SKIP_CALIBRATE=1 \
  python scripts/extreme_run.py 50000000 20
run_job extreme_10m_err 900 python scripts/extreme_run.py 10000000 10 0.8
run_job verify_drive_1m 1500 bash scripts/verify_drive_1m.sh
run_job staleness_tau32 1200 python scripts/staleness_scan.py 1000000 6.0 2 256 0 0,32
run_job extreme_20m_v3 2400 python scripts/extreme_run.py 20000000 30
echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
