#!/usr/bin/env bash
# Round-5 continuation queue, job 2: remat-policy A/B on the real chip
# (NEXT.md perf lever #4).  Waits for the bench warmup to drain, takes
# the single chip lock, bounds the run with a hard deadline so the chip
# is quiet before the driver's end-of-round bench, and auto-commits the
# result JSON (VERDICT r4 ask #9).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r5_queue_status.txt
note () { echo "[r5b_queue2 $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

# absolute wall bound for this job (seconds from launch), default 45 min
END_EPOCH=${END_EPOCH:-$(( $(date -u +%s) + 2700 ))}

note "queue2 waiting for r5b bench to drain"
while ! grep -q "r5b queue done" "$STATUS" 2>/dev/null; do
    [ "$(date -u +%s)" -ge "$END_EPOCH" ] && { note "deadline passed waiting; exiting"; exit 0; }
    sleep 15
done

LOCK=/tmp/tpu_chip.lock
until mkdir "$LOCK" 2>/dev/null; do
    if [ -f "$LOCK/pid" ] && ! ps -p "$(cat "$LOCK/pid")" > /dev/null 2>&1; then
        rm -rf "$LOCK"
        continue
    fi
    [ "$(date -u +%s)" -ge "$END_EPOCH" ] && { note "deadline passed waiting for lock; exiting"; exit 0; }
    sleep 15
done
echo $$ > "$LOCK/pid"
trap 'rm -rf "$LOCK"' EXIT

BUDGET=$(( END_EPOCH - $(date -u +%s) ))
[ "$BUDGET" -lt 300 ] && { note "only ${BUDGET}s left; skipping remat A/B"; exit 0; }
note "chip lock acquired (pid $$); start remat_ab (budget ${BUDGET}s)"

if timeout "$BUDGET" python tools/profile_remat_ab.py \
        --deadline $(( BUDGET - 120 )) \
        --out results/vae_remat_ab.json > logs/remat_ab.log 2>&1; then
    note "ok    remat_ab ($(python -c "import json;d=json.load(open('results/vae_remat_ab.json'));print(d['variants_ms'])" 2>/dev/null))"
else
    note "remat_ab hit the deadline (rc=$?); partial JSON kept"
fi
if [ -f results/vae_remat_ab.json ]; then
    git add results/vae_remat_ab.json
    git commit -m "Remat-policy A/B on the full-cap VAE train step" \
        results/vae_remat_ab.json >/dev/null 2>&1 || true
fi
note "r5b queue2 done; chip quiesced"
