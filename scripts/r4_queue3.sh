#!/usr/bin/env bash
# Round-4 TPU job queue, part 3 (this session's follow-up runner).
# Waits until BOTH the quality protocol (scripts/train_quality_v4.sh) and
# the conditional demo (scripts/demo_cond.sh) have released the chip —
# "done" = all three metric JSONs exist, or the process absent for 5
# consecutive minutes — then runs the remaining VERDICT r3 asks serially.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r4_queue_status.txt

note () { echo "[r4_queue3 $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

wait_absent () {  # wait_absent <pattern> <done-file>
    local absent=0
    while [ "$absent" -lt 5 ]; do
        if [ -n "$2" ] && [ -f "$2" ]; then break; fi
        if pgrep -f "$1" > /dev/null 2>&1; then
            absent=0
        else
            absent=$((absent + 1))
        fi
        sleep 60
    done
}

wait_absent "train_quality_v4.sh" results/metrics_q4_dpmpp25.json
note "quality protocol done; metrics present: $(ls results/metrics_q4_*.json 2>/dev/null | wc -l)/3"
wait_absent "demo_cond.sh" results/class_purity_cond.json
note "cond demo done; purity present: $(ls results/class_purity_cond.json 2>/dev/null | wc -l)"

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
note "queue3 done"
