#!/usr/bin/env bash
# Round-3 TPU bench queue, run once the quality pipeline releases the
# chip.  Ordered by value: (1) pairwise CD+EMD throughput at reference
# eval-set scale (VERDICT r2 #2 — the last unmeasured eval capability),
# (2) a bench.py preview that warms .jax_cache/.bench_cache for the
# driver's end-of-round run, (3) cross-shape batched-generation
# throughput (BENCH_BATCH=4), (4) train-step refresh at full capacity
# for the PERF.md training table (VERDICT r2 weak #4).
set -x
LOGS=${LOGS:-logs}
mkdir -p $LOGS

python benchmarks/bench_eval_scale.py 2048 5 \
    2>&1 | tee $LOGS/bench_eval_scale.txt

python bench.py 2>&1 | tee $LOGS/bench_preview.txt

BENCH_BATCH=4 BENCH_FAST=0 BENCH_ITERS=3 python bench.py \
    2>&1 | tee $LOGS/bench_batch4.txt

python benchmarks/bench_train_steps.py 131072 2 \
    2>&1 | tee $LOGS/bench_train_steps.txt

python benchmarks/bench_hr_train.py 131072 \
    2>&1 | tee $LOGS/bench_hr_train.txt

echo "[post-benches done]"
