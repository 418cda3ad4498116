#!/usr/bin/env bash
# Round-4 pre-flight (VERDICT r3 item #2): measure the occupancy-weighted
# lr split-loss lever BEFORE committing the full quality run.  Trains three
# short lr stages (identical config/seed/steps, pos_weight 1/3/8), then
# samples each with tools/lr_occupancy.py and records gt-ratio per weight.
# ~15 min/probe on a free v5e; output -> results/probe_pos_weight.txt
# (git-tracked — logs/ has been wiped twice, METRICS_r03.md).
set -euo pipefail
cd "$(dirname "$0")/.."
LOGS=${LOGS:-logs}
CFG=${CFG:-configs/synthetic_medium_v2.yaml}
STEPS=${STEPS:-4000}
OUT=results/probe_pos_weight.txt
mkdir -p results "$LOGS"

stage_done () {
    python - "$1" "$2" <<'EOF'
import sys, re, pathlib
run, target = pathlib.Path(sys.argv[1]), int(sys.argv[2])
steps = [int(m.group(1)) for p in run.glob("ckpt/steps-*")
         if (m := re.match(r"steps-(\d+)$", p.name))]
sys.exit(0 if steps and max(steps) >= target else 1)
EOF
}

{
  echo "# pos_weight probe: lr stage, $STEPS steps each, $(date -u +%FT%TZ)"
  echo "# config: $CFG  (v3 30k-step baseline: ancestral gt-ratio 0.42)"
} > "$OUT"

for W in 1 3 8; do
    NAME=q4probe_w$W
    stage_done $LOGS/$NAME $STEPS || \
    python train.py --model union --stage lr --mode train --config $CFG \
        --name $NAME --logs_dir $LOGS --max_steps $STEPS --pos_weight $W
    echo "== pos_weight=$W (step $STEPS) ==" >> "$OUT"
    python tools/lr_occupancy.py --config $CFG --run $LOGS/$NAME \
        --count 24 --gt_count 48 --samplers ancestral,dpmpp \
        | tee -a "$OUT"
done
echo "[probe done] $(date -u +%FT%TZ)" >> "$OUT"
