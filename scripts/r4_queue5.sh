#!/usr/bin/env bash
# Round-4 TPU job queue, part 5: true cold-start measurement (VERDICT r3
# ask #7 — "logs/ shows a cold run < 500 s setup").
#
# Cold = empty XLA compilation cache AND no .bench_cache init params; the
# round-3 number was 957 s with ~7 cascade programs compiling serially
# through the axon tunnel.  Round 4 added UnionSolver.warm_compile, which
# lowers+compiles every stage's program concurrently, so this measures
# whether parallel remote compile clears the <500 s bar.  The warm
# .jax_cache is left untouched by pointing OCTFUSION_JAX_CACHE at a temp
# dir, so the driver's end-of-round bench still starts warm.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r4_queue_status.txt

note () { echo "[r4_queue5 $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

while ! grep -q "queue4 done" "$STATUS" 2>/dev/null; do sleep 60; done

note "start cold bench (temp compile cache, parallel warm-compile)"
COLD=$(mktemp -d /tmp/coldcache.XXXX)
if env OCTFUSION_JAX_CACHE="$COLD" BENCH_PARAM_CACHE=0 BENCH_ITERS=2 \
        python bench.py > logs/bench_cold_r4.txt 2>&1; then
    note "ok    cold bench: $(grep -o '"setup_s": [0-9.]*' logs/bench_cold_r4.txt | head -1)"
    grep '^{' logs/bench_cold_r4.txt | tail -1 > results/bench_cold_r4.json || true
else
    note "FAIL  cold bench (rc=$?, see logs/bench_cold_r4.txt)"
fi
rm -rf "$COLD"
note "queue5 done"
