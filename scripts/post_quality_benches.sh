#!/usr/bin/env bash
# TPU bench queue, run once the quality pipeline releases the chip.
# Ordered by value: (1) pairwise CD+EMD throughput at reference eval-set
# scale, (2) a bench.py preview that warms .jax_cache/.bench_cache for
# the driver's end-of-round run, (3) cross-shape batched-generation
# throughput, (4) train-step refresh at full capacity for PERF.md's
# training table.
#
# Round-4 hardening (VERDICT r3 #4: two benches died silently on a
# missing PYTHONPATH and the failure sat unread in logs/): strict mode,
# explicit PYTHONPATH, per-bench return codes checked THROUGH the tee
# (pipefail), and a machine-readable pass/fail summary appended to
# results/bench_queue_status.txt so the outcome is git-trackable.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOGS=${LOGS:-logs}
STATUS=results/bench_queue_status.txt
mkdir -p "$LOGS" results
echo "# bench queue $(date -u +%FT%TZ)" >> "$STATUS"

FAILED=0
run_bench () {  # run_bench <logname> <cmd...>
    local log=$LOGS/$1; shift
    echo "[bench] $* -> $log"
    if "$@" 2>&1 | tee "$log"; then
        echo "PASS $log: $*" >> "$STATUS"
    else
        local rc=$?
        echo "FAIL rc=$rc $log: $*" >> "$STATUS"
        FAILED=1
    fi
}

run_bench bench_train_steps.txt python benchmarks/bench_train_steps.py 131072 2
run_bench bench_hr_train.txt python benchmarks/bench_hr_train.py 131072
run_bench bench_eval_scale.txt python benchmarks/bench_eval_scale.py 2048 5
run_bench bench_preview.txt python bench.py

echo "[post-benches done] failed=$FAILED (see $STATUS)"
exit $FAILED
