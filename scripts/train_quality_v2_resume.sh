#!/usr/bin/env bash
# Resume the round-3 v2 quality run after the lr stage (e.g. following a
# TPU-relay outage): hr retrain against the frozen q3b_lr checkpoint, two
# matched sample sets (ancestral-100 / DPM-Solver++(2M)-50), then the full
# eval contract against the held-out reference set.  Idempotent: training
# auto-resumes from logs/q3b_hr/ckpt, generation skips nothing (cheap
# relative to training), evals reuse the FID feature caches.
set -e
LOGS=${LOGS:-logs}
CFG=${CFG:-configs/synthetic_medium_v2.yaml}
HR_STEPS=${HR_STEPS:-7000}
COUNT=${COUNT:-512}

python train.py --model union --stage hr --mode train --config $CFG \
    --name q3b_hr --logs_dir $LOGS --max_steps $HR_STEPS \
    --vq_ckpt $LOGS/q3_vae/ckpt/steps-latest \
    --pretrain_ckpt $LOGS/q3b_lr/ckpt/steps-latest

if [ ! -d "$LOGS/q3b_hr/results_airplane_ancestral100" ]; then
    python train.py --model union --stage hr --mode generate --config $CFG \
        --name q3b_hr --logs_dir $LOGS --count $COUNT \
        --vq_ckpt $LOGS/q3_vae/ckpt/steps-latest
    mv $LOGS/q3b_hr/results_airplane \
       $LOGS/q3b_hr/results_airplane_ancestral100
fi

if [ ! -d "$LOGS/q3b_hr/results_airplane_dpmpp50" ]; then
    python train.py --model union --stage hr --mode generate --config $CFG \
        --name q3b_hr --logs_dir $LOGS --count $COUNT \
        --sampler dpmpp --sample_steps 50 \
        --vq_ckpt $LOGS/q3_vae/ckpt/steps-latest
    mv $LOGS/q3b_hr/results_airplane $LOGS/q3b_hr/results_airplane_dpmpp50
fi

[ -d "$LOGS/ref_synthetic" ] || python tools/make_reference_set.py \
    --out $LOGS/ref_synthetic --start 10000 --count $COUNT --resolution 128

for SET in ancestral100 dpmpp50; do
    echo "[eval] $SET"
    python tools/evaluate.py \
        --samples "$LOGS/q3b_hr/results_airplane_$SET/*.obj" \
        --reference "$LOGS/ref_synthetic/*.obj" \
        --emd --fid_standin --batch 16 \
        --out $LOGS/metrics_q3b_$SET.json
done
echo "[done] metrics in $LOGS/metrics_q3b_{ancestral100,dpmpp50}.json"
