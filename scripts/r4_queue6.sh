#!/usr/bin/env bash
# Round-4 TPU job queue, part 6 — replaces queues 4 and 5 (killed before
# this one starts) with a re-prioritised serial plan for the remaining
# wall clock.  Rationale: the dpmpp-50/25 columns scored within noise of
# ancestral (METRICS_r04.md), so the fast-path ask is CLOSED; the open
# north-star axis is 1-NNA ~0.84, and scripts/train_quality_v5.sh is the
# measured-lever attack on it (decoder axis + lr-schedule axis, scored
# incrementally so a wall-clock cut keeps partial evidence).  The
# conditional-extension and cold-bench jobs from queues 4/5 are retained
# BEHIND it because their VERDICT asks are already satisfied at demo
# scale / are cheap but less load-bearing.
#
#   1. scripts/train_quality_v5.sh   (recon ceilings + v5a + v5b)
#   2. cond_v2: STEPS=2600 conditional re-run   (from queue4)
#   3. cold bench with temp compile cache       (from queue5)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r4_queue_status.txt

note () { echo "[r4_queue6 $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

while ! grep -q "queue3 done" "$STATUS" 2>/dev/null; do sleep 60; done

run_step () {  # run_step <name> <cmd...>
    local NAME=$1; shift
    note "start $NAME"
    if "$@" > "logs/r4_${NAME}.log" 2>&1; then
        note "ok    $NAME"
    else
        note "FAIL  $NAME (rc=$?, see logs/r4_${NAME}.log)"
    fi
}

run_step quality_v5 bash scripts/train_quality_v5.sh

# ---- cond_v2 (verbatim intent of scripts/r4_queue4.sh) -------------------
note "start cond_v2 (STEPS=2600)"
rm -rf logs/cond_hr/results_airplane logs/cond_hr/results_car \
       logs/cond_hr/results_chair logs/cond_hr/results_table \
       logs/cond_hr/results_rifle
if STEPS=2600 bash scripts/demo_cond.sh > logs/r4_cond_v2.log 2>&1; then
    note "ok    cond_v2 ($(tail -2 logs/r4_cond_v2.log | head -1))"
else
    note "FAIL  cond_v2 (rc=$?, see logs/r4_cond_v2.log)"
fi

# ---- cold bench (verbatim intent of scripts/r4_queue5.sh) ----------------
note "start cold bench (temp compile cache, parallel warm-compile)"
COLD=$(mktemp -d /tmp/coldcache.XXXX)
if env OCTFUSION_JAX_CACHE="$COLD" BENCH_PARAM_CACHE=0 BENCH_ITERS=2 \
        python bench.py > logs/bench_cold_r4.txt 2>&1; then
    note "ok    cold bench: $(grep -o '"setup_s": [0-9.]*' logs/bench_cold_r4.txt | head -1)"
    grep '^{' logs/bench_cold_r4.txt | tail -1 > results/bench_cold_r4.json || true
else
    note "FAIL  cold bench (rc=$?, see logs/bench_cold_r4.txt)"
fi
note "queue6 done"
