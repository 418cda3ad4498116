"""Generation-quality evaluation driver.

Counterpart of the reference's offline pipeline (SURVEY.md §3.5):
``metrics/generate_pointclouds.py`` (mesh -> 2048 unit-cube surface samples)
+ ``metrics/1-NNA.py`` / ``cov_mmd.py`` (pairwise CD/EMD -> metrics).

    python tools/evaluate.py --samples 'logs/run/results_airplane/*.obj' \
        --reference 'data/ref_meshes/*.obj' [--emd] [--points 2048]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def meshes_to_pointclouds(paths, n_points: int, seed: int = 0):
    from octfusion_tpu.utils import mesh as mesh_utils

    clouds = []
    kept = []
    for i, p in enumerate(paths):
        v, f = mesh_utils.load_obj(p)
        if len(f) == 0:
            continue
        # unit-cube normalisation (`metrics/generate_pointclouds.py:28-37`)
        centre = (v.min(0) + v.max(0)) / 2
        scale = (v.max(0) - v.min(0)).max()
        v = (v - centre) / max(scale, 1e-9)
        pts = mesh_utils.sample_surface(v, f, n_points, seed=seed + i)
        clouds.append(pts.astype(np.float32))
        kept.append(p)
    return np.stack(clouds), kept


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", required=True)
    p.add_argument("--reference", required=True)
    p.add_argument("--points", type=int, default=2048)
    p.add_argument("--emd", action="store_true")
    p.add_argument("--emd_bf16", action="store_true",
                   help="store the EMD auction matrices in bfloat16 "
                        "(~2x faster at eval scale, <0.25%% off fp32)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--shard", action="store_true",
                   help="shard the pairwise tile grid across ALL local "
                        "devices (rows on a 1-D mesh, no collectives; "
                        "eval wall divides by the device count)")
    p.add_argument("--fid", action="store_true",
                   help="also compute per-view shading FID on mesh renders "
                        "(needs OCTFUSION_INCEPTION_WEIGHTS)")
    p.add_argument("--fid_standin", action="store_true",
                   help="per-view Frechet distance under the fixed-seed "
                        "random-conv STAND-IN features (no pretrained "
                        "weights needed; reported as fid_standin — NOT "
                        "comparable to Inception-FID numbers)")
    p.add_argument("--fid_views", type=int, default=20)
    p.add_argument("--skip_pairwise", action="store_true",
                   help="skip the pairwise CD/EMD metrics (FID-only pass; "
                        "lets the CPU-bound render run off the accelerator "
                        "critical path while the next stage trains)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the env var alone is not "
                        "enough: sitecustomize pre-imports jax against the "
                        "accelerator, so a FID-only pass would otherwise "
                        "still claim the chip and contend with training)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from octfusion_tpu.utils import jaxcache

    # persistent compile cache: a fresh eval process otherwise pays full
    # remote compiles for the pairwise tiles (50-300 s each on axon)
    jaxcache.enable()

    s_paths = sorted(glob.glob(args.samples))
    r_paths = sorted(glob.glob(args.reference))
    assert s_paths and r_paths, (args.samples, args.reference)
    res = {}
    if not args.skip_pairwise:
        from octfusion_tpu.metrics import evaluation

        t0 = time.time()
        sp, _ = meshes_to_pointclouds(s_paths, args.points, seed=0)
        rp, _ = meshes_to_pointclouds(r_paths, args.points, seed=10_000)
        t_sample = time.time() - t0
        print(f"[*] {len(sp)} samples vs {len(rp)} references "
              f"({args.points} pts each, surface sampling {t_sample:.1f}s)")
        t1 = time.time()
        res = evaluation.evaluate_point_sets(
            sp, rp, batch=args.batch, emd=args.emd, emd_bf16=args.emd_bf16,
            shard_devices="auto" if args.shard else None)
        res["wall_s_pointcloud_sampling"] = round(t_sample, 1)
        res["wall_s_pairwise_metrics"] = round(time.time() - t1, 1)
    t1 = time.time()
    def _fid_caches():
        # per-set feature caches next to the meshes: the fixed reference set
        # renders once across repeated evals of different sample sets
        return (os.path.join(os.path.dirname(s_paths[0]), ".fid_cache"),
                os.path.join(os.path.dirname(r_paths[0]), ".fid_cache"))

    if args.fid:
        from octfusion_tpu.metrics import fid as fid_lib

        sc, rc = _fid_caches()
        res["shading_fid"] = fid_lib.shading_fid(
            s_paths, r_paths, n_views=args.fid_views,
            cache_dir=sc, reference_cache_dir=rc,
        )
    if args.fid_standin:
        from octfusion_tpu.metrics import fid as fid_lib

        sc, rc = _fid_caches()
        print(f"[*] rendering {len(s_paths)}+{len(r_paths)} meshes x "
              f"{args.fid_views} views for stand-in shading FID "
              f"(pairwise wall "
              f"{res.get('wall_s_pairwise_metrics', 'skipped')}s)",
              flush=True)
        res["shading_fid_standin"] = fid_lib.shading_fid(
            s_paths, r_paths, n_views=args.fid_views,
            feature_fn=fid_lib.standin_feature_extractor(),
            cache_dir=sc, reference_cache_dir=rc,
        )
    if args.fid or args.fid_standin:
        res["wall_s_fid"] = round(time.time() - t1, 1)
    print(json.dumps(res, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
