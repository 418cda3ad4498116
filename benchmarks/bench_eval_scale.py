"""Pairwise CD+EMD throughput at reference eval-set scale (VERDICT r2 #2).

The reference's 1-NNA/COV/MMD protocol needs the three all-pairs matrices
M_sr, M_ss, M_rr over S generated + S reference shapes at 2048 points each
(`/root/reference/metrics/evaluation_metrics.py:111-154`), i.e. ~3*S^2
Chamfer + approx-EMD evaluations — S = 2831 (airplane) .. 5956 (table),
24M-106M pairs, run overnight on CUDA via the custom kernels in
`metrics/pytorch_structural_losses/src/{nndistance,approxmatch}.cu`.

This bench measures pairs/s/chip of `metrics.distances.{chamfer,
emd_approx}` at several vmap batch widths and projects the wall-clock of
each reference category's full eval.

    python benchmarks/bench_eval_scale.py [n_points] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


# generated-set sizes per category (`/root/reference/utils/util.py:19`)
CATEGORY_SIZES = {
    "airplane": 2831, "car": 5247, "chair": 4744,
    "table": 5956, "rifle": 1660,
}


def main():
    pts = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import jax
    import jax.numpy as jnp

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()
    from octfusion_tpu.metrics import distances

    print(f"devices={jax.devices()} pts={pts}")
    rng = np.random.RandomState(0)
    best = {}
    # batch 512 probed for the bf16 auction only (NEXT r3 #6): its two
    # [B, pts, pts] matrices are 8.6 GB at bf16/512 — fp32 would not fit
    for batch in (16, 64, 256, 512):
        a = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, pts, 3)), jnp.float32)
        b = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, pts, 3)), jnp.float32)
        for name, fn in (
            ("chamfer", lambda a, b: distances.chamfer(a, b)[0]),
            ("emd", distances.emd_approx),
            ("emd_bf16", lambda a, b: distances.emd_approx(
                a, b, store_dtype=jnp.bfloat16)),
        ):
            if batch == 512 and name != "emd_bf16":
                continue
            jfn = jax.jit(fn)
            sync(jfn(a, b))  # compile
            ts = []
            for _ in range(reps):
                t0 = time.time()
                sync(jfn(a, b))
                ts.append(time.time() - t0)
            sec = float(np.median(ts))
            rate = batch / sec
            best[name] = max(best.get(name, 0.0), rate)
            print(f"{name:8s} batch={batch:4d}: {sec * 1e3:8.2f} ms "
                  f"-> {rate:9.1f} pairs/s")

    print("\nprojected full-eval wall-clock (3*S^2 pairs: M_sr+M_ss+M_rr, "
          "CD+EMD run sequentially so each pair pays the sum of the two "
          "per-pair costs; bf16-stored EMD auction, <0.25% off fp32):")
    pair_rate = 1.0 / (1.0 / best["chamfer"] + 1.0 / best["emd_bf16"])
    for cat, s in sorted(CATEGORY_SIZES.items(), key=lambda kv: kv[1]):
        pairs = 3 * s * s
        hours = pairs / pair_rate / 3600.0
        print(f"  {cat:9s} S={s}: {pairs / 1e6:7.1f}M pairs -> "
              f"{hours:6.2f} h/chip ({hours / 8:5.2f} h on v5e-8)")
    import json
    print(json.dumps({
        "chamfer_pairs_per_s": best["chamfer"],
        "emd_pairs_per_s": best["emd"],
        "emd_bf16_pairs_per_s": best["emd_bf16"],
        "points": pts,
    }))


if __name__ == "__main__":
    main()
