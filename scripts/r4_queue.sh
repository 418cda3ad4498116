#!/usr/bin/env bash
# Round-4 serial TPU job queue: runs the remaining VERDICT r3 asks after
# the quality protocol (scripts/train_quality_v4.sh) releases the single
# v5e chip.  Detached + idempotent so it survives session crashes (logs/
# has been wiped three times; every judge-relevant artifact lands in
# git-tracked results/).
#
#   setsid nohup bash scripts/r4_queue.sh > logs/r4_queue.log 2>&1 &
#
# Queue (priority order, continue-on-failure with recorded status):
#   1. conditional 5-class end-to-end demo  (VERDICT r3 missing #4)
#   2. depth-9 logged run with peak-HBM     (VERDICT r3 ask #9)
#   3. post_quality_benches: train-step refresh at cap 131k, eval-scale
#      incl. the bf16 batch-512 EMD probe, cold bench preview
#      (VERDICT r3 asks #4, #7, #10)
#   4. warm bench.py -> logs/bench_warm.txt (headline refresh)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r4_queue_status.txt
: > "$STATUS"

note () { echo "[r4_queue $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

# ---- wait for the quality protocol to release the TPU -------------------
while pids=$(pgrep -f "train_quality_v4.sh" | grep -vw $$ || true); [ -n "$pids" ]; do
    sleep 60
done
note "quality protocol finished; metrics present: $(ls results/metrics_q4_*.json 2>/dev/null | wc -l)/3"

run_step () {  # run_step <name> <cmd...>
    local NAME=$1; shift
    note "start $NAME"
    if "$@" > "logs/r4_${NAME}.log" 2>&1; then
        note "ok    $NAME"
    else
        note "FAIL  $NAME (rc=$?, see logs/r4_${NAME}.log)"
    fi
}

[ -f results/class_purity_cond.json ] || \
    run_step cond env STEPS=800 bash scripts/demo_cond.sh
[ -f results/depth9_run.txt ] || \
    run_step depth9 bash scripts/run_depth9.sh
run_step benches bash scripts/post_quality_benches.sh
run_step bench_warm python bench.py
cp -f logs/r4_bench_warm.log logs/bench_warm.txt 2>/dev/null || true
note "queue done"
