"""Class-consistency check for conditional generation.

The reference's conditional workload (`scripts/run_snet_cond.sh`,
`configs/octfusion_snet_cond.yaml:17-27`) conditions the lr/hr U-Nets on a
5-class label embedding (`graph_unet_lr.py:113-114`) but ships no class
metric; for the synthetic family stand-in (SyntheticDataset
``class_families=True``) class consistency IS measurable: each generated
mesh is assigned the class of its Chamfer-nearest reference family, and
purity = fraction assigned the conditioning class.  Chance level is 1/5.

    python tools/class_purity.py --root logs/cond_hr --config \
        configs/synthetic_cond.yaml [--refs_per_class 16] [--points 1024]

Expects per-class sample dirs ``results_<category>`` for the 5 reference
category names (label order `data/shapenet.py::category_5_to_label`).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def normalise(v: np.ndarray) -> np.ndarray:
    centre = (v.min(0) + v.max(0)) / 2
    scale = (v.max(0) - v.min(0)).max()
    return (v - centre) / max(scale, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="run dir containing results_<category>/ subdirs")
    ap.add_argument("--config", required=True)
    ap.add_argument("--refs_per_class", type=int, default=16)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--out", default=None, help="JSON output path")
    args = ap.parse_args()

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()  # avoid full remote compiles per fresh process

    from octfusion_tpu import config as config_lib
    from octfusion_tpu.data.dataset import get_dataset
    from octfusion_tpu.data.shapenet import category_5_to_label
    from octfusion_tpu.metrics.distances import pairwise_cd_emd
    from octfusion_tpu.utils import mesh as mesh_utils

    cfg = config_lib.load_config(args.config)
    assert cfg.data.class_families, "config must set data.class_families"
    ds = get_dataset(cfg.data)
    n_cls = cfg.diffusion.num_classes
    rng = np.random.RandomState(0)

    # reference clouds per class, normalised like the samples
    ref, ref_lab = [], []
    for c in range(n_cls):
        got = 0
        for idx in range(c, len(ds), n_cls):
            item = ds[idx]
            pts = item["points"]
            pts = pts[rng.randint(0, len(pts), args.points)]
            ref.append(normalise(pts))
            ref_lab.append(c)
            got += 1
            if got >= args.refs_per_class:
                break
    ref = np.stack(ref).astype(np.float32)
    ref_lab = np.asarray(ref_lab)

    per_class, n_total, n_pure = {}, 0, 0
    lab_of = {c: l for c, l in category_5_to_label.items()}
    names = [c for c, _ in sorted(category_5_to_label.items(),
                                  key=lambda kv: kv[1]) if lab_of[c] < n_cls]
    for cat, label in sorted(category_5_to_label.items(), key=lambda kv: kv[1]):
        if label >= n_cls:
            continue
        paths = sorted(glob.glob(os.path.join(
            args.root, f"results_{cat}", "*.obj")))
        if not paths:
            print(f"[warn] no meshes for class {label} ({cat})")
            continue
        clouds = []
        for i, p in enumerate(paths):
            v, f = mesh_utils.load_obj(p)
            if len(f) == 0:
                continue
            clouds.append(mesh_utils.sample_surface(
                normalise(v), f, args.points, seed=1000 + i))
        if not clouds:
            per_class[cat] = {"n": 0, "purity": 0.0}
            continue
        s = np.stack(clouds).astype(np.float32)
        d, _ = pairwise_cd_emd(s, ref, emd=False)       # [n_samples, n_refs]
        pred = ref_lab[np.argmin(d, axis=1)]
        pure = int((pred == label).sum())
        # confusion row + margin: mean CD to the own class vs the best
        # class — near-ties (margin ~1.0) are boundary blurs, large
        # margins are genuinely wrong-family shapes
        conf = {c: int((pred == lab_of[c]).sum()) for c in names}
        own = float(np.mean(
            [d[i, ref_lab == label].min() for i in range(len(s))]))
        best = float(d.min(1).mean())
        per_class[cat] = {
            "n": len(s), "purity": pure / len(s), "confusion": conf,
            "mean_own_class_cd": round(own, 5),
            "mean_best_cd": round(best, 5),
            "margin": round(own / max(best, 1e-9), 3),
        }
        n_total += len(s)
        n_pure += pure
        print(f"[class {label} {cat:9s}] n={len(s):3d} purity="
              f"{pure / len(s):.2f}  margin={own / max(best, 1e-9):.2f}  "
              f"confusion={conf}")

    res = {"per_class": per_class,
           "overall_purity": n_pure / max(n_total, 1),
           "n_total": n_total, "chance": 1.0 / n_cls}
    print(f"[overall] purity {res['overall_purity']:.3f} over {n_total} "
          f"meshes (chance {res['chance']:.2f})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)
        print("[out]", args.out)


if __name__ == "__main__":
    main()
