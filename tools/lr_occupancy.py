"""Diagnose lr-stage split occupancy from a trained checkpoint.

The unconditional lr diffusion stage denoises the depth-full_depth split
grid whose ground truth is ~95% empty (reference codec
`/root/reference/utils/util_dualoctree.py:199-211`); an under-trained
model mode-collapses toward the all-empty grid, which the ancestral
sampler's sign snapping below the truncation time then locks in
(`octfusion_model_union.py:324-325`).  This tool samples N split grids
per sampler from a checkpoint and compares their positive-entry
occupancy against the dataset's ground truth — a cheap CPU pre-flight
before spending hours of device time on the downstream cascade
(METRICS_r03.md run-v1 post-mortem).

Usage:
  python tools/lr_occupancy.py --config configs/synthetic_medium_v2.yaml \
      --run logs/q3b_lr [--count 32] [--samplers ancestral,ddim,dpmpp] \
      [--steps 100]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--run", required=True,
                    help="run dir containing ckpt/ (e.g. logs/q3b_lr)")
    ap.add_argument("--count", type=int, default=32)
    ap.add_argument("--gt_count", type=int, default=64)
    ap.add_argument("--samplers", default="ancestral,ddim,dpmpp")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()  # avoid full remote compiles per fresh process

    from octfusion_tpu import config as config_lib
    from octfusion_tpu.data.dataset import collate, get_dataset
    from octfusion_tpu.models.common import batch_to_octree
    from octfusion_tpu.models.union_solver import UnionSolver
    from octfusion_tpu.octree import split_codec
    from octfusion_tpu.utils import ckpt as ckpt_lib

    cfg = config_lib.load_config(args.config)
    ds = get_dataset(cfg.data)

    # ground-truth occupancy over dataset shapes
    gt_fracs = []
    solver = UnionSolver(cfg, stage_flag="lr")
    for i in range(args.gt_count):
        b = collate([ds[i % len(ds)]])
        octree = batch_to_octree(
            jnp.asarray(b["points"]), jnp.asarray(b["normals"]), solver.spec1
        )
        split = split_codec.octree2split_small(octree)
        gt_fracs.append(float(jnp.mean(split > 0)))
    gt_fracs = np.asarray(gt_fracs)
    print(f"[gt]  n={len(gt_fracs)}  occupancy mean {gt_fracs.mean():.4f}  "
          f"median {np.median(gt_fracs):.4f}  min {gt_fracs.min():.4f}  "
          f"max {gt_fracs.max():.4f}")

    # checkpoint
    b0 = collate([ds[0]])
    jb = {k: jnp.asarray(v) for k, v in b0.items() if k != "filename"}
    state = solver.init_state(jax.random.PRNGKey(0), jb)
    path = ckpt_lib.latest_path(os.path.join(args.run, "ckpt"))
    if path is None:
        raise SystemExit(f"no checkpoint under {args.run}/ckpt")
    state = ckpt_lib.restore(path, state)
    print(f"[ckpt] {path} (step {int(state.step)})")

    steps = args.steps or cfg.diffusion.ddim_steps
    for name in args.samplers.split(","):
        name = name.strip()
        eta = 0.0 if name == "ddim" else 1.0
        solver_name = "dpmpp" if name == "dpmpp" else "ancestral"
        cfg_s = dataclasses.replace(
            cfg, diffusion=dataclasses.replace(cfg.diffusion,
                                               sampler=solver_name))
        sv = UnionSolver(cfg_s, stage_flag="lr")
        n_steps = steps // 2 if name == "dpmpp" else steps

        @jax.jit
        def draw(key):
            return sv.sample_lr(state.ema_params, key,
                                batch_size=1, steps=n_steps, eta=eta)

        fracs = []
        for i in range(args.count):
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
            split = np.asarray(draw(key))
            fracs.append(float((split > 0).mean()))
        fracs = np.asarray(fracs)
        empty = float((fracs == 0).mean())
        print(f"[{name:9s}] steps={n_steps:3d}  occupancy mean "
              f"{fracs.mean():.4f}  median {np.median(fracs):.4f}  "
              f"min {fracs.min():.4f}  max {fracs.max():.4f}  "
              f"all-empty {100 * empty:.0f}%  "
              f"(gt-ratio {fracs.mean() / max(gt_fracs.mean(), 1e-9):.2f})")


if __name__ == "__main__":
    main()
