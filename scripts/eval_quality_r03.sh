#!/usr/bin/env bash
# Round-3 quality evaluation protocol (VERDICT r2 item #1), run after
# scripts/train_quality.sh's 200-step ancestral generation finishes:
#
#   1. archive the ancestral-200 sample set;
#   2. generate a second set with the DPM-Solver++(2M) fast path at 50
#      steps from the SAME checkpoints/seeds;
#   3. build the held-out analytic reference set;
#   4. score both sets with the full reference metric battery
#      (1-NNA / COV / MMD over CD+EMD, per-view shading Frechet distance
#      under the documented stand-in features), timing each eval.
#
# Results land in $LOGS/metrics_q3_{ancestral200,dpmpp50}.json and feed
# METRICS_r03.md.
set -e
LOGS=${LOGS:-logs}
CFG=${CFG:-configs/synthetic_medium.yaml}
COUNT=${COUNT:-512}

RA=$LOGS/q3_hr/results_airplane
[ -d "$RA" ] && mv "$RA" "$LOGS/q3_hr/results_airplane_ancestral200"

python train.py --model union --stage hr --mode generate --config $CFG \
    --name q3_hr --logs_dir $LOGS --count $COUNT \
    --sampler dpmpp --sample_steps 50 \
    --vq_ckpt $LOGS/q3_vae/ckpt/steps-latest
mv "$RA" "$LOGS/q3_hr/results_airplane_dpmpp50"

[ -d "$LOGS/ref_synthetic" ] || python tools/make_reference_set.py \
    --out $LOGS/ref_synthetic --start 10000 --count $COUNT --resolution 128

for SET in ancestral200 dpmpp50; do
    echo "[eval] $SET"
    /usr/bin/time -v python tools/evaluate.py \
        --samples "$LOGS/q3_hr/results_airplane_$SET/*.obj" \
        --reference "$LOGS/ref_synthetic/*.obj" \
        --emd --fid_standin --batch 16 \
        --out $LOGS/metrics_q3_$SET.json 2> $LOGS/eval_time_$SET.log
done
echo "metrics in $LOGS/metrics_q3_{ancestral200,dpmpp50}.json"
