#!/usr/bin/env bash
# End-to-end ON-TPU demo at depth 6 (64^3 effective): trains VAE, lr and
# hr stages on procedural synthetic shapes, then generates meshes from the
# trained weights through the pipelined compact-mesh path.
#
#   STEPS=600 bash scripts/demo_tpu.sh
#
# On one v5e (shared pool) each stage is a few minutes of step time plus
# remote compiles (cached under .jax_cache/ after the first run).
set -e
LOGS=${LOGS:-logs}
CFG=${CFG:-configs/synthetic_medium.yaml}
STEPS=${STEPS:-600}

python train.py --model vae --mode train --config $CFG \
    --name demo_tpu_vae --logs_dir $LOGS --max_steps $STEPS

python train.py --model union --stage lr --mode train --config $CFG \
    --name demo_tpu_lr --logs_dir $LOGS --max_steps $STEPS

python train.py --model union --stage hr --mode train --config $CFG \
    --name demo_tpu_hr --logs_dir $LOGS --max_steps $STEPS \
    --vq_ckpt $LOGS/demo_tpu_vae/ckpt/steps-latest \
    --pretrain_ckpt $LOGS/demo_tpu_lr/ckpt/steps-latest

python train.py --model union --stage hr --mode generate --config $CFG \
    --name demo_tpu_hr --logs_dir $LOGS --count 4 \
    --vq_ckpt $LOGS/demo_tpu_vae/ckpt/steps-latest

echo "meshes under $LOGS/demo_tpu_hr/results_airplane/"
