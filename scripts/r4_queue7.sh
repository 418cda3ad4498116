#!/usr/bin/env bash
# Round-4 TPU job queue, part 7: depth-9 retry, LAST in line.
#
# The first depth-9 attempt wedged before step 0 — its device stream
# froze (CPU time flat for ~50 min) after three clients contended for
# the single axon chip (results/r4_queue_status.txt 08:17Z).  The queue
# design has since been fixed to strictly serial; this retry runs after
# queue6 (v5 quality protocol + cond_v2 + cold bench) releases the chip,
# uncontended.  A fresh run overwrites the partial results/depth9_run.txt.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r4_queue_status.txt

note () { echo "[r4_queue7 $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

while ! grep -q "queue6 done" "$STATUS" 2>/dev/null; do sleep 60; done

# ---- metric null calibration (cheap, ~10 min) ----------------------------
# 1-NNA between two DISJOINT held-out ground-truth sets (indices 10000+
# vs 20000+) measures what the metric pipeline reports for i.i.d. draws
# from the same distribution at this sample size — the empirical anchor
# for "ideal 0.5" that generated-set scores should be read against
# (reference protocol's implicit null, `metrics/evaluation_metrics.py:221-246`).
if [ ! -f results/metrics_null_refs.json ]; then
    note "start null calibration (ref vs ref_b)"
    if python tools/evaluate.py \
            --samples 'logs/ref_synthetic_b/*.obj' \
            --reference 'logs/ref_synthetic/*.obj' \
            --emd --emd_bf16 --batch 16 \
            --out results/metrics_null_refs.json \
            > logs/r4_null_calib.log 2>&1; then
        note "ok    null calibration"
    else
        note "FAIL  null calibration (rc=$?, see logs/r4_null_calib.log)"
    fi
fi

note "start depth9 retry (uncontended)"
rm -rf logs/d9_vae logs/d9_lr logs/d9_hr
if timeout 5400 bash scripts/run_depth9.sh > logs/r4_depth9_retry.log 2>&1; then
    note "ok    depth9 retry"
else
    note "FAIL  depth9 retry (rc=$?, see logs/r4_depth9_retry.log)"
fi
note "queue7 done"
