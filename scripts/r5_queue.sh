#!/usr/bin/env bash
# Round-5 TPU job queue — the ONLY queue for round 5 (VERDICT r4 weak #6 /
# ask #8: one queue, one lock).  Waits for the round-4 queues to drain
# (queue7 — null calibration + depth-9 retry — is last in that chain),
# takes a chip lockfile, then runs strictly serially:
#
#   1. quality_v5 restart under a watchdog-retry loop.  The r4 attempt
#      died at VAE step 3400/6000 on a transport wedge; the trainer's
#      StallWatchdog exits rc=3 precisely so a launcher can restart it
#      (train_quality_v5.sh is idempotent and auto-resumes), but the r4
#      queue treated any rc as terminal.  This loop is the fix.
#   2. commit the cond_v2 purity artifacts (queue6 re-scores purity at
#      2600 steps but does not commit — VERDICT ask #9).
#   3. VAE full-cap train-step profile (VERDICT ask #7), bounded.
#   4. warm bench for the round record (median-of-N headline).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r5_queue_status.txt
note () { echo "[r5_queue $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

note "waiting for round-4 queues to drain (queue7 last)"
while ! grep -q "queue7 done" results/r4_queue_status.txt 2>/dev/null; do
    sleep 60
done

# ---- chip lock: mkdir is atomic; a lock whose recorded pid is dead is
# stale and reclaimed.  Every future TPU job script must take this lock.
LOCK=/tmp/tpu_chip.lock
until mkdir "$LOCK" 2>/dev/null; do
    if [ -f "$LOCK/pid" ] && ! ps -p "$(cat "$LOCK/pid")" > /dev/null 2>&1; then
        rm -rf "$LOCK"
        continue
    fi
    sleep 30
done
echo $$ > "$LOCK/pid"
trap 'rm -rf "$LOCK"' EXIT
note "r4 queues drained; chip lock acquired (pid $$)"

# ---- 1. v5 quality protocol: restart + retry on watchdog exits -----------
TRIES=0
while :; do
    TRIES=$((TRIES + 1))
    if bash scripts/train_quality_v5.sh >> logs/r5_quality_v5.log 2>&1; then
        note "ok    quality_v5 (attempt $TRIES)"
        break
    fi
    RC=$?
    if [ "$TRIES" -ge 8 ]; then
        note "FAIL  quality_v5 after $TRIES attempts (last rc=$RC)"
        break
    fi
    note "retry quality_v5 (rc=$RC after attempt $TRIES; auto-resume)"
    sleep 60
done

# ---- 2. cond_v2 purity artifacts into git ---------------------------------
git add results/class_purity_cond.json results/class_purity_cond.txt \
    2>/dev/null || true
git diff --cached --quiet || \
    git commit -q -m "Conditional cascade at 2600 steps: re-scored class purity" \
    || true

# ---- 3. VAE full-capacity train-step profile (bounded) ---------------------
if [ ! -f results/vae_step_profile.json ]; then
    note "start vae_profile"
    if timeout 3000 python tools/profile_vae_step.py \
            --out results/vae_step_profile.json \
            > logs/r5_vae_profile.log 2>&1; then
        note "ok    vae_profile"
        git add results/vae_step_profile.json 2>/dev/null || true
        git diff --cached --quiet || \
            git commit -q -m "Profile the full-capacity VAE train step" || true
    else
        note "FAIL  vae_profile (rc=$?, see logs/r5_vae_profile.log)"
    fi
fi

# ---- 4. warm bench for the round record ------------------------------------
note "start bench_warm"
if timeout 5400 python bench.py > logs/r5_bench_warm.txt 2>&1; then
    grep '^{' logs/r5_bench_warm.txt | tail -1 > results/bench_warm_r5.json \
        || true
    git add results/bench_warm_r5.json 2>/dev/null || true
    git diff --cached --quiet || \
        git commit -q -m "Round-5 warm bench record" || true
    note "ok    bench_warm"
else
    note "FAIL  bench_warm (rc=$?, see logs/r5_bench_warm.txt)"
fi
note "r5 queue done"
