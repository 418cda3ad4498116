"""Export held-out ground-truth meshes of the synthetic dataset.

The quality evaluation (VERDICT r2 #1) needs a *reference* shape set to
compare generated samples against, playing the role of the ShapeNet test
split in the reference protocol (`metrics/1-NNA.py:22-27`,
`metrics/generate_pointclouds.py:23-37` — eval sets are the per-category
test splits, 2831-5956 shapes).  The synthetic dataset is procedurally
seeded per index (`data/dataset.py::SyntheticDataset.__getitem__`), so any
index range disjoint from the training range [0, size) is a held-out
i.i.d. draw from the same distribution.  This tool marches the *analytic*
SDF of each held-out shape to an .obj:

    python tools/make_reference_set.py --out data/ref_synthetic \
        --start 10000 --count 512 --resolution 128
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--start", type=int, default=10_000,
                   help="first shape index (training uses [0, 1000))")
    p.add_argument("--count", type=int, default=512)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--bbox", type=float, default=0.9,
                   help="grid half-extent (reference sdf_scale)")
    args = p.parse_args()

    from octfusion_tpu.data.dataset import SyntheticDataset
    from octfusion_tpu.utils import mesh as mesh_utils

    os.makedirs(args.out, exist_ok=True)
    ds = SyntheticDataset()
    n = args.resolution
    ax = np.linspace(-args.bbox, args.bbox, n).astype(np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    grid = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)

    for k in range(args.count):
        idx = args.start + k
        rng = np.random.RandomState(idx * 9176 + 13)
        sdf_fn = ds._make_sdf(rng)
        sdf = sdf_fn(grid).reshape(n, n, n)
        v, f = mesh_utils.marching_tetrahedra(sdf)
        if len(f) == 0:
            print(f"[!] shape {idx}: empty surface, skipped")
            continue
        # voxel coords -> world coords (same convention as generate's export)
        v = v / (n - 1) * (2 * args.bbox) - args.bbox
        mesh_utils.save_obj(os.path.join(args.out, f"ref_{idx:06d}.obj"), v, f)
        if (k + 1) % 50 == 0:
            print(f"[*] {k + 1}/{args.count}")
    print(f"[*] wrote reference meshes to {args.out}")


if __name__ == "__main__":
    main()
