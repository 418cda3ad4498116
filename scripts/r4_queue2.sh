#!/usr/bin/env bash
# Round-4 TPU job queue, part 2 (the conditional demo already ran).
# Waits for the quality protocol to be REALLY done — scripts/r4_queue.sh
# fired prematurely during a protocol kill+restart gap — by requiring the
# protocol to be absent for 5 consecutive minutes OR all three metric
# JSONs to exist, then runs the remaining VERDICT r3 asks serially.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r4_queue_status.txt

note () { echo "[r4_queue2 $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

absent=0
while [ "$absent" -lt 5 ]; do
    if [ -f results/metrics_q4_dpmpp25.json ]; then break; fi
    if pgrep -f "train_quality_v4.sh" > /dev/null 2>&1; then
        absent=0
    else
        absent=$((absent + 1))
    fi
    sleep 60
done
note "quality protocol done; metrics present: $(ls results/metrics_q4_*.json 2>/dev/null | wc -l)/3"

run_step () {  # run_step <name> <cmd...>
    local NAME=$1; shift
    note "start $NAME"
    if "$@" > "logs/r4_${NAME}.log" 2>&1; then
        note "ok    $NAME"
    else
        note "FAIL  $NAME (rc=$?, see logs/r4_${NAME}.log)"
    fi
}

[ -f results/depth9_run.txt ] || \
    run_step depth9 bash scripts/run_depth9.sh
run_step benches bash scripts/post_quality_benches.sh
run_step bench_fast25 env BENCH_FAST_STEPS=25 BENCH_ITERS=3 python bench.py
note "queue2 done"
