#!/usr/bin/env bash
# Round-4 TPU job queue, part 4: longer conditional schedule.
#
# The STEPS=800 conditional demo produced under-resolved blobs in every
# class (radial stats in results/class_purity_cond.txt analysis): purity
# 0.60 with car/chair at 0 because blobby spheres are Chamfer-nearest to
# the sphere/cross families regardless of label.  Training resumes from
# the existing cond_{vae,lr,hr} checkpoints (stage_done targets scale
# with STEPS), so this extends 800/1600/800 -> 2600/5200/2600 rather
# than restarting.  Generation dirs are cleared so the purity metric
# scores fresh meshes.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs results
STATUS=results/r4_queue_status.txt

note () { echo "[r4_queue4 $(date -u +%FT%TZ)] $*" | tee -a "$STATUS"; }

# wait for queue3's terminal line (it appends "queue3 done" to STATUS)
while ! grep -q "queue3 done" "$STATUS" 2>/dev/null; do sleep 60; done

note "start cond_v2 (STEPS=2600)"
rm -rf logs/cond_hr/results_airplane logs/cond_hr/results_car \
       logs/cond_hr/results_chair logs/cond_hr/results_table \
       logs/cond_hr/results_rifle
if STEPS=2600 bash scripts/demo_cond.sh > logs/r4_cond_v2.log 2>&1; then
    note "ok    cond_v2 ($(tail -2 logs/r4_cond_v2.log | head -1))"
else
    note "FAIL  cond_v2 (rc=$?, see logs/r4_cond_v2.log)"
fi
note "queue4 done"
