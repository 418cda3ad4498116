"""Precompute octree split tensors for fast lr-stage training.

Counterpart of `/root/reference/tools/gen_split.py`: for each shape in a
filelist, build the octree on device and store ``split_small`` (the dense
full-depth split grid) as npz, so the lr diffusion stage can train without
touching point clouds.

    python tools/precompute_splits.py --config configs/... \
        --location data/prepared --filelist data/prepared/filelist.txt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--location", required=True)
    p.add_argument("--filelist", required=True)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from octfusion_tpu.config import load_config
    from octfusion_tpu.data.dataset import ShapeNetDataset
    from octfusion_tpu.models.common import batch_to_octree_jit
    from octfusion_tpu.octree import split_codec
    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()
    cfg = load_config(args.config)
    spec = cfg.capacity.octree_spec(cfg.model.depth, cfg.model.full_depth, 1)
    ds = ShapeNetDataset(
        args.location, args.filelist, cfg.data.point_scale,
        point_sample_num=1, points_per_shape=cfg.data.points_per_shape,
        load_sdf=False,
    )

    split_fn = jax.jit(
        lambda p, n: split_codec.octree2split_small(
            batch_to_octree_jit(p[None], n[None], spec)
        )
    )
    for i in range(len(ds)):
        s = ds[i]
        split = split_fn(jnp.asarray(s["points"]), jnp.asarray(s["normals"]))
        out = os.path.join(args.location, ds.filenames[i], "split_small.npz")
        np.savez(out, split_small=np.asarray(split)[0])
        print(f"[{i + 1}/{len(ds)}] {ds.filenames[i]}")


if __name__ == "__main__":
    main()
