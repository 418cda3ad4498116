#!/usr/bin/env bash
# Round-3 quality run v2 (METRICS_r03.md): the v1 run's 32-channel lr
# stage mode-collapsed to empty splits (70% empty meshes), so retrain the
# lr stage at reference scale (synthetic_medium_v2.yaml: 64 ch, 2 res
# blocks, batch 8) with the cached synthetic loader, retrain the hr stage
# against the new frozen lr, then generate matched ancestral-100 and
# DPM-Solver++(2M)-50 sample sets and score both against the held-out
# analytic reference set.
set -e
LOGS=${LOGS:-logs}
CFG=${CFG:-configs/synthetic_medium_v2.yaml}
LR_STEPS=${LR_STEPS:-20000}
HR_STEPS=${HR_STEPS:-7000}
COUNT=${COUNT:-512}

python train.py --model union --stage lr --mode train --config $CFG \
    --name q3b_lr --logs_dir $LOGS --max_steps $LR_STEPS

python train.py --model union --stage hr --mode train --config $CFG \
    --name q3b_hr --logs_dir $LOGS --max_steps $HR_STEPS \
    --vq_ckpt $LOGS/q3_vae/ckpt/steps-latest \
    --pretrain_ckpt $LOGS/q3b_lr/ckpt/steps-latest

python train.py --model union --stage hr --mode generate --config $CFG \
    --name q3b_hr --logs_dir $LOGS --count $COUNT \
    --vq_ckpt $LOGS/q3_vae/ckpt/steps-latest
mv $LOGS/q3b_hr/results_airplane $LOGS/q3b_hr/results_airplane_ancestral100

python train.py --model union --stage hr --mode generate --config $CFG \
    --name q3b_hr --logs_dir $LOGS --count $COUNT \
    --sampler dpmpp --sample_steps 50 \
    --vq_ckpt $LOGS/q3_vae/ckpt/steps-latest
mv $LOGS/q3b_hr/results_airplane $LOGS/q3b_hr/results_airplane_dpmpp50

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
