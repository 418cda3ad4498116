"""Measure a VAE checkpoint's reconstruction ceiling on held-out shapes.

The generation cascade can never score better than the VAE's own
encode -> decode -> mesh round trip (the reference's stage-1 autoencoder
plays the same role, `/root/reference/models/octfusion_model_vae.py:189-205`).
When generated-set metrics stall, this tool separates "the diffusion
stages are under-trained" from "the decoder itself is the ceiling": it
reconstructs the SAME held-out indices that `tools/make_reference_set.py`
marches analytically, so `tools/evaluate.py` on (recon, reference) yields
the ceiling as ordinary 1-NNA/COV/MMD numbers — an ideal decoder scores
1-NNA ~0.5 and near-zero MMD.

Usage (TPU, ~10 min at count 128):
  python tools/vae_recon_eval.py --config configs/synthetic_medium_v2.yaml \
      --run logs/q4_vae --start 10000 --count 128 --out logs/recon_q4
  python tools/evaluate.py --samples 'logs/recon_q4/*.obj' \
      --reference 'logs/ref_synthetic/*.obj' --emd --emd_bf16 --batch 16 \
      --out results/metrics_recon_q4.json
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--run", required=True,
                    help="run dir containing ckpt/ (e.g. logs/q4_vae)")
    ap.add_argument("--out", required=True, help="directory for recon .obj")
    ap.add_argument("--start", type=int, default=10_000,
                    help="first held-out index (must match the ref set)")
    ap.add_argument("--count", type=int, default=128)
    ap.add_argument("--resolution", type=int, default=None,
                    help="SDF grid size (default: config solver.resolution)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from octfusion_tpu.utils import jaxcache

    # persistent compile cache: without it every fresh recon process pays
    # full remote compiles (50-300 s/program over the axon tunnel)
    jaxcache.enable()

    from octfusion_tpu import config as config_lib
    from octfusion_tpu.data.dataset import (
        SyntheticDataset, collate, fits_capacity,
    )
    from octfusion_tpu.models.vae_solver import VAESolver
    from octfusion_tpu.utils import ckpt as ckpt_lib

    cfg = config_lib.load_config(args.config)
    solver = VAESolver(cfg)
    ds = SyntheticDataset()
    os.makedirs(args.out, exist_ok=True)

    b0 = collate([ds[args.start]])
    jb0 = {k: jnp.asarray(v) for k, v in b0.items() if k != "filename"}
    state = solver.init_state(jax.random.PRNGKey(0), jb0, total_steps=10)
    path = ckpt_lib.latest_path(os.path.join(args.run, "ckpt"))
    if path is None:
        raise SystemExit(f"no checkpoint under {args.run}/ckpt")
    state = ckpt_lib.restore(path, state)
    print(f"[ckpt] {path} (step {int(state.step)})")

    key = jax.random.PRNGKey(0)
    done = skipped = 0
    t0 = t_hb = time.time()
    for k in range(args.count):
        idx = args.start + k
        dst = os.path.join(args.out, f"recon_{idx:06d}.obj")
        if os.path.exists(dst):
            done += 1
            continue
        item = ds[idx]
        # capacity pre-check mirrors training's CapacityFilteredDataset:
        # an overflowing build silently drops nodes -> garbage recon
        if not fits_capacity(item["points"], solver.spec1,
                             solver.edge_factor):
            print(f"[!] shape {idx}: exceeds octree capacity, skipped")
            skipped += 1
            continue
        batch = collate([item])
        solver.reconstruct(
            state.params, batch, key, resolution=args.resolution,
            save_paths=[dst], fast_mesh=True,
        )
        done += 1
        if time.time() - t_hb > 60:
            rate = (time.time() - t0) / max(done, 1)
            print(f"[*] {done}/{args.count} ({rate:.1f} s/shape)", flush=True)
            t_hb = time.time()
    print(f"[done] {done} recon meshes in {args.out} "
          f"({skipped} skipped for capacity, {time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
