#!/usr/bin/env bash
# Round-3 quality run: train the synthetic depth-6 config to convergence
# on the v5e (the `scripts/demo_tpu.sh` path, many more steps), then
# generate a large sample set for the 1-NNA/COV/MMD/FID evaluation
# (VERDICT.md round-3 item #1; reference eval contract
# `/root/reference/metrics/evaluation_metrics.py:111-246`).
#
#   VAE_STEPS=6000 LR_STEPS=4000 HR_STEPS=6000 COUNT=512 \
#       bash scripts/train_quality.sh
set -e
LOGS=${LOGS:-logs}
CFG=${CFG:-configs/synthetic_medium.yaml}
VAE_STEPS=${VAE_STEPS:-6000}
LR_STEPS=${LR_STEPS:-4000}
HR_STEPS=${HR_STEPS:-6000}
COUNT=${COUNT:-512}

python train.py --model vae --mode train --config $CFG \
    --name q3_vae --logs_dir $LOGS --max_steps $VAE_STEPS

python train.py --model union --stage lr --mode train --config $CFG \
    --name q3_lr --logs_dir $LOGS --max_steps $LR_STEPS

python train.py --model union --stage hr --mode train --config $CFG \
    --name q3_hr --logs_dir $LOGS --max_steps $HR_STEPS \
    --vq_ckpt $LOGS/q3_vae/ckpt/steps-latest \
    --pretrain_ckpt $LOGS/q3_lr/ckpt/steps-latest

python train.py --model union --stage hr --mode generate --config $CFG \
    --name q3_hr --logs_dir $LOGS --count $COUNT \
    --vq_ckpt $LOGS/q3_vae/ckpt/steps-latest

# held-out ground-truth reference set (indices disjoint from training)
python tools/make_reference_set.py --out $LOGS/ref_synthetic \
    --start 10000 --count $COUNT --resolution 128

# 1-NNA / COV / MMD over CD+EMD (reference protocol, 2048 pts/shape)
python tools/evaluate.py \
    --samples "$LOGS/q3_hr/results_airplane/*.obj" \
    --reference "$LOGS/ref_synthetic/*.obj" \
    --emd --out $LOGS/metrics_q3.json

echo "meshes under $LOGS/q3_hr/results_airplane/; metrics in $LOGS/metrics_q3.json"
