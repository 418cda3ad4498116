#!/usr/bin/env bash
# End-to-end demo on procedural synthetic shapes (no external data).
# Validated on a v5e: VAE loss 140 -> ~6 over 400 steps, split accuracy
# ~95%+, reconstruction chamfer ~0.02-0.05 at shape scale 0.5 (16^3
# effective resolution of the tiny config).
set -e
LOGS=${LOGS:-logs}
CFG=configs/synthetic_tiny.yaml

python train.py --model vae --mode train --config $CFG \
    --name demo_vae --logs_dir $LOGS --max_steps 400 --batch_size 4

python train.py --model union --stage lr --mode train --config $CFG \
    --name demo_lr --logs_dir $LOGS --max_steps 400 --batch_size 4

python train.py --model union --stage hr --mode train --config $CFG \
    --name demo_hr --logs_dir $LOGS --max_steps 400 --batch_size 4 \
    --vq_ckpt $LOGS/demo_vae/ckpt/steps-latest

python train.py --model union --stage hr --mode generate --config $CFG \
    --name demo_hr --logs_dir $LOGS --count 4 \
    --vq_ckpt $LOGS/demo_vae/ckpt/steps-latest

echo "meshes under $LOGS/demo_hr/results_airplane/"
