#!/usr/bin/env bash
# Round-3 quality run v3: full restart of the v2 protocol after the
# container restart wiped logs/ (METRICS_r03.md — the v2 lr stage had
# completed 20000 steps but every checkpoint was lost with the host).
# Identical to v2 (synthetic_medium_v2.yaml: lr U-Net at reference scale)
# except the lr stage trains 30000 steps (v2's 20000 left a 2-2.5x
# occupancy bias vs ground truth; the reference trains ~23x longer, so
# push as far as the wall clock allows).  Every stage is idempotent:
# train.py auto-resumes from ckpt/steps-latest, generation/eval stages
# are skipped when their outputs already exist.
set -e
LOGS=${LOGS:-logs}
CFG=${CFG:-configs/synthetic_medium_v2.yaml}
VAE_STEPS=${VAE_STEPS:-6000}
LR_STEPS=${LR_STEPS:-30000}
HR_STEPS=${HR_STEPS:-7000}
COUNT=${COUNT:-512}

stage_done () {  # stage_done <rundir> <steps>: ckpt at/after target step?
    python - "$1" "$2" <<'EOF'
import sys, re, pathlib
run, target = pathlib.Path(sys.argv[1]), int(sys.argv[2])
steps = [int(m.group(1)) for p in run.glob("ckpt/steps-*")
         if (m := re.match(r"steps-(\d+)$", p.name))]
sys.exit(0 if steps and max(steps) >= target else 1)
EOF
}

stage_done $LOGS/q3_vae $VAE_STEPS || \
python train.py --model vae --mode train --config $CFG \
    --name q3_vae --logs_dir $LOGS --max_steps $VAE_STEPS

stage_done $LOGS/q3b_lr $LR_STEPS || \
python train.py --model union --stage lr --mode train --config $CFG \
    --name q3b_lr --logs_dir $LOGS --max_steps $LR_STEPS

stage_done $LOGS/q3b_hr $HR_STEPS || \
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
    [ -f "$LOGS/metrics_q3b_$SET.json" ] && continue
    echo "[eval] $SET"
    python tools/evaluate.py \
        --samples "$LOGS/q3b_hr/results_airplane_$SET/*.obj" \
        --reference "$LOGS/ref_synthetic/*.obj" \
        --emd --fid_standin --batch 16 \
        --out $LOGS/metrics_q3b_$SET.json
done
echo "[done] metrics in $LOGS/metrics_q3b_{ancestral100,dpmpp50}.json"
