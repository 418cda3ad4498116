#!/usr/bin/env bash
# Depth-9 (512^3 effective) short train + generate on the v5e, with peak-HBM
# evidence (VERDICT r3 ask #9: "a logged run, not just tests/test_depth9.py").
# Output -> git-tracked results/depth9_run.txt.
# Reference topology: configs/vae_snet_eval_depth984.yaml (10-17); depth-10
# capacity math is tested in tests/test_depth9.py.
set -euo pipefail
cd "$(dirname "$0")/.."
LOGS=${LOGS:-logs}
CFG=configs/synthetic_depth9.yaml
STEPS=${STEPS:-120}
OUT=results/depth9_run.txt
mkdir -p results "$LOGS"
export OCTFUSION_LOG_MEM=1

{
  echo "# depth-9 end-to-end run, $(date -u +%FT%TZ)  (config $CFG, $STEPS steps/stage)"
  echo "== vae train =="
  python train.py --model vae --mode train --config $CFG \
      --name d9_vae --logs_dir $LOGS --max_steps $STEPS 2>&1 \
      | grep -E "step|\[mem\]|\[\*\]|\[!\]|overflow" | tail -8
  echo "== lr train =="
  python train.py --model union --stage lr --mode train --config $CFG \
      --name d9_lr --logs_dir $LOGS --max_steps $STEPS --pos_weight 2 2>&1 \
      | grep -E "step|\[mem\]|\[\*\]|\[!\]|overflow" | tail -6
  echo "== hr train =="
  python train.py --model union --stage hr --mode train --config $CFG \
      --name d9_hr --logs_dir $LOGS --max_steps $STEPS \
      --vq_ckpt $LOGS/d9_vae/ckpt/steps-latest \
      --pretrain_ckpt $LOGS/d9_lr/ckpt/steps-latest 2>&1 \
      | grep -E "step|\[mem\]|\[\*\]|\[!\]|overflow" | tail -6
  echo "== generate (2 shapes, dpmpp-50) =="
  python train.py --model union --stage hr --mode generate --config $CFG \
      --name d9_hr --logs_dir $LOGS --count 2 --sampler dpmpp --sample_steps 50 \
      --vq_ckpt $LOGS/d9_vae/ckpt/steps-latest 2>&1 \
      | grep -E "\[mem\]|\[\*\]|\[!\]" | tail -6
  ls -la $LOGS/d9_hr/results_airplane/ | tail -3
  echo "[depth9 done] $(date -u +%FT%TZ)"
} | tee "$OUT"
