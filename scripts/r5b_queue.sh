#!/usr/bin/env bash
# Round-5 continuation queue (fresh VM: cold XLA cache, no checkpoints).
# Job 1: bench.py — re-warms the persistent compile cache so the driver's
#        end-of-round bench is not dominated by cold remote compiles, and
#        records a fresh median measurement on the quiet chip.
# Serial, one chip lock (NEXT.md #11).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r5_queue_status.txt
note () { echo "[r5b_queue $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

LOCK=/tmp/tpu_chip.lock
until mkdir "$LOCK" 2>/dev/null; do
    if [ -f "$LOCK/pid" ] && ! ps -p "$(cat "$LOCK/pid")" > /dev/null 2>&1; then
        rm -rf "$LOCK"
        continue
    fi
    sleep 15
done
echo $$ > "$LOCK/pid"
trap 'rm -rf "$LOCK"' EXIT
note "chip lock acquired (pid $$); start bench_warmup"

if timeout 1500 python bench.py > results/bench_warm_r5b.json 2> logs/bench_warm_r5b.log; then
    note "ok    bench_warmup ($(tail -c 300 results/bench_warm_r5b.json | head -c 120))"
    git add results/bench_warm_r5b.json 2>/dev/null || true
else
    note "FAIL  bench_warmup (rc=$?)"
fi
note "r5b queue done"
