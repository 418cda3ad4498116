#!/usr/bin/env bash
# Poll the TPU relay; the moment a device can actually COMPILE AND RUN a
# program (not merely enumerate — the 2026-08-17 outage had jax.devices()
# succeeding while the remote_compile endpoint refused connections), launch
# the idempotent round-3 v2 quality-run resume
# (scripts/train_quality_v2_resume.sh).  If the resume itself dies — e.g.
# the relay flaps mid-run — fall back to polling and re-launch; every stage
# of the resume script is restart-safe (training auto-resumes from ckpt,
# generation/eval steps are skipped when their outputs exist).
cd "$(dirname "$0")/.."
while true; do
    if timeout 120 python - <<'EOF'
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
x = (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
assert float(x[0, 0]) == 128.0
print("relay up (compile+run ok):", d)
EOF
    then
        echo "[relay_watch] device is back, starting resume $(date)"
        if bash scripts/train_quality_v2_resume.sh; then
            echo "[relay_watch] resume COMPLETE $(date)"
            exit 0
        fi
        echo "[relay_watch] resume FAILED (relay flap?), re-polling $(date)"
    fi
    echo "[relay_watch] still down $(date)"
    sleep 120
done
