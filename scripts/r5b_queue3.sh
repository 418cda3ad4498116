#!/usr/bin/env bash
# Round-5 continuation queue, job 3 (serial, one chip lock):
#  a) bench.py with BENCH_PARALLEL_WARM=0 — the remote compile helper
#     SIGKILLs under concurrent full-cap compiles (logs/remat_ab.log,
#     2026-08-20), so warm the persistent .jax_cache serially; the
#     driver's end-of-round bench then starts tracing-only.
#  b) remat A/B retry for the 'conv' policy (its first compile died to
#     the same helper kill); 'full' re-times from the warm cache.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r5_queue_status.txt
note () { echo "[r5b_queue3 $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

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
note "chip lock acquired (pid $$); start bench_serial_warm"

if BENCH_PARALLEL_WARM=0 timeout 3000 python bench.py \
        > results/bench_warm_r5b.json 2> logs/bench_warm_r5b.log; then
    note "ok    bench_serial_warm ($(head -c 120 results/bench_warm_r5b.json))"
    git add results/bench_warm_r5b.json
    git commit -q -m "Round-5 continuation warm bench (serial compile warm)" \
        results/bench_warm_r5b.json 2>/dev/null || true
else
    note "FAIL  bench_serial_warm (rc=$?)"
fi

note "start remat_ab_retry (conv)"
if timeout 1900 python tools/profile_remat_ab.py \
        --policies conv,full --deadline 1700 \
        --out results/vae_remat_ab.json > logs/remat_ab2.log 2>&1; then
    note "ok    remat_ab_retry ($(python -c "import json;d=json.load(open('results/vae_remat_ab.json'));print(d['variants_ms'])" 2>/dev/null))"
else
    note "remat_ab_retry hit the deadline (rc=$?); partial JSON kept"
fi
if [ -f results/vae_remat_ab.json ]; then
    git add results/vae_remat_ab.json
    git commit -q -m "Remat-policy A/B: conv vs full on the full-cap VAE step" \
        results/vae_remat_ab.json 2>/dev/null || true
fi
note "r5b queue3 done; chip quiesced"
