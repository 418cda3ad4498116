#!/usr/bin/env bash
# Conditional 5-class end-to-end demo (VERDICT r3 missing #4): trains the
# class-conditional cascade on the family-labelled synthetic set
# (configs/synthetic_cond.yaml), generates per-class samples through the
# full lr->hr->decode->mesh path, and scores class consistency by
# nearest-reference-class purity (tools/class_purity.py; chance = 0.2).
#
# Reference counterpart: `scripts/run_snet_cond.sh` +
# `configs/octfusion_snet_cond.yaml:17-27` (label embedding at
# `graph_unet_lr.py:113-114`).  Category names reuse the reference's
# 5-class map (airplane/car/chair/table/rifle -> labels 0-4); for the
# synthetic stand-in these are the sphere/box/torus/dumbbell/cross
# families in label order.
#
#   STEPS=800 bash scripts/demo_cond.sh
set -euo pipefail
cd "$(dirname "$0")/.."
LOGS=${LOGS:-logs}
CFG=${CFG:-configs/synthetic_cond.yaml}
STEPS=${STEPS:-800}
COUNT=${COUNT:-8}

stage_done () {
    python - "$1" "$2" <<'EOF'
import sys, re, pathlib
run, target = pathlib.Path(sys.argv[1]), int(sys.argv[2])
steps = [int(m.group(1)) for p in run.glob("ckpt/steps-*")
         if (m := re.match(r"steps-(\d+)$", p.name))]
sys.exit(0 if steps and max(steps) >= target else 1)
EOF
}

stage_done $LOGS/cond_vae $STEPS || \
python train.py --model vae --mode train --config $CFG \
    --name cond_vae --logs_dir $LOGS --max_steps $STEPS

stage_done $LOGS/cond_lr $((2 * STEPS)) || \
python train.py --model union --stage lr --mode train --config $CFG \
    --name cond_lr --logs_dir $LOGS --max_steps $((2 * STEPS)) --pos_weight 2

stage_done $LOGS/cond_hr $STEPS || \
python train.py --model union --stage hr --mode train --config $CFG \
    --name cond_hr --logs_dir $LOGS --max_steps $STEPS \
    --vq_ckpt $LOGS/cond_vae/ckpt/steps-latest \
    --pretrain_ckpt $LOGS/cond_lr/ckpt/steps-latest

for CAT in airplane car chair table rifle; do
    [ -d "$LOGS/cond_hr/results_$CAT" ] && \
        [ "$(ls $LOGS/cond_hr/results_$CAT/*.obj 2>/dev/null | wc -l)" -ge "$COUNT" ] && continue
    python train.py --model union --stage hr --mode generate --config $CFG \
        --name cond_hr --logs_dir $LOGS --count $COUNT --category $CAT \
        --vq_ckpt $LOGS/cond_vae/ckpt/steps-latest
done

mkdir -p results
python tools/class_purity.py --root $LOGS/cond_hr --config $CFG \
    --out results/class_purity_cond.json | tee results/class_purity_cond.txt
echo "[done] per-class meshes under $LOGS/cond_hr/results_*/, purity in results/class_purity_cond.json"
