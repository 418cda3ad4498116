#!/usr/bin/env bash
# Round-5 opportunistic queue: v5c — push the measured lr-convergence
# lever further (v5b proved it: lr 8k->30k moved 1-NNA-CD 0.840->0.800,
# METRICS_r05.md).  v5c extends lr 30k->45k and retrains hr fresh.
#
# Runs ONLY if the wall clock allows: every stage checks the DEADLINE
# (default 00:40Z) and the script exits cleanly when past it, releasing
# the chip so the driver's end-of-round bench gets a quiet device.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r5_queue_status.txt
note () { echo "[r5_queue3 $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }
DEADLINE_EPOCH=${DEADLINE_EPOCH:-$(date -u -d "tomorrow 00:40" +%s)}
past_deadline () { [ "$(date -u +%s)" -ge "$DEADLINE_EPOCH" ]; }

LOGS=logs
CFG=configs/synthetic_medium_v2.yaml
LR_STEPS=45000
HR_STEPS=4000
COUNT=256

note "queue3 waiting for queue2 to drain (deadline $(date -u -d @$DEADLINE_EPOCH +%FT%TZ))"
while ! grep -q "queue2 done" "$STATUS" 2>/dev/null; do
    past_deadline && { note "deadline passed while waiting; exiting"; exit 0; }
    sleep 60
done

LOCK=/tmp/tpu_chip.lock
until mkdir "$LOCK" 2>/dev/null; do
    if [ -f "$LOCK/pid" ] && ! ps -p "$(cat "$LOCK/pid")" > /dev/null 2>&1; then
        rm -rf "$LOCK"
        continue
    fi
    past_deadline && { note "deadline passed waiting for lock; exiting"; exit 0; }
    sleep 30
done
echo $$ > "$LOCK/pid"
trap 'rm -rf "$LOCK"' EXIT
note "chip lock acquired (pid $$); start v5c"

stage_done () {
    python - "$1" "$2" <<'EOF'
import sys, re, pathlib
run, target = pathlib.Path(sys.argv[1]), int(sys.argv[2])
steps = [int(m.group(1)) for p in run.glob("ckpt/steps-*")
         if (m := re.match(r"steps-(\d+)$", p.name))]
sys.exit(0 if steps and max(steps) >= target else 1)
EOF
}

run_v5c () {
    set -e
    # extend a COPY (q5b_lr stays frozen at 30k for q5b_hr's provenance)
    if [ ! -d "$LOGS/q5c_lr" ]; then
        cp -a "$LOGS/q5b_lr" "$LOGS/q5c_lr"
        LATEST=$(basename "$(readlink "$LOGS/q5c_lr/ckpt/steps-latest")")
        ln -sfn "$(pwd)/$LOGS/q5c_lr/ckpt/$LATEST" \
            "$LOGS/q5c_lr/ckpt/steps-latest"
    fi
    stage_done $LOGS/q5c_lr $LR_STEPS || \
    python train.py --model union --stage lr --mode train --config $CFG \
        --name q5c_lr --logs_dir $LOGS --max_steps $LR_STEPS \
        --pos_weight 1.75

    past_deadline && exit 9
    stage_done $LOGS/q5c_hr $HR_STEPS || \
    python train.py --model union --stage hr --mode train --config $CFG \
        --name q5c_hr --logs_dir $LOGS --max_steps $HR_STEPS \
        --vq_ckpt $LOGS/q5_vae/ckpt/steps-latest \
        --pretrain_ckpt $LOGS/q5c_lr/ckpt/steps-latest

    past_deadline && exit 9
    python train.py --model union --stage hr --mode generate --config $CFG \
        --name q5c_hr --logs_dir $LOGS --count $COUNT \
        --vq_ckpt $LOGS/q5_vae/ckpt/steps-latest
    [ -d "$LOGS/q5c_hr/results_airplane_a100" ] || \
        mv "$LOGS/q5c_hr/results_airplane" "$LOGS/q5c_hr/results_airplane_a100"

    past_deadline && exit 9
    python tools/evaluate.py \
        --samples "$LOGS/q5c_hr/results_airplane_a100/*.obj" \
        --reference "$LOGS/ref_synthetic/*.obj" \
        --emd --emd_bf16 --batch 16 \
        --out results/metrics_q5c.json
    set +e
}

if run_v5c > logs/r5_v5c.log 2>&1; then
    note "ok    v5c ($(python -c "import json;d=json.load(open('results/metrics_q5c.json'));print('1nna_cd %.3f cov_cd %.3f'%(d['1nna_cd'],d['cov_cd']))" 2>/dev/null))"
else
    RC=$?
    if [ "$RC" = 9 ]; then
        note "v5c stopped at deadline (partial stages checkpointed)"
    else
        note "FAIL  v5c (rc=$RC, see logs/r5_v5c.log)"
    fi
fi
git add results/metrics_q5c.json 2>/dev/null || true
git diff --cached --quiet || \
    git commit -q -m "v5c: lr extended to 45k; ancestral-100 metric set" || true
note "queue3 done"
