#!/usr/bin/env bash
# Poll the TPU relay; the moment a device responds, launch the idempotent
# round-3 v2 quality-run resume (scripts/train_quality_v2_resume.sh).
# Used after the 2026-08-17 relay outage (METRICS_r03.md).
cd "$(dirname "$0")/.."
while true; do
    if timeout 90 python - <<'EOF'
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("relay up:", d)
EOF
    then
        echo "[relay_watch] device is back, starting resume $(date)"
        exec bash scripts/train_quality_v2_resume.sh
    fi
    echo "[relay_watch] still down $(date)"
    sleep 120
done
