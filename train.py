"""Training / generation entry point.

TPU-native counterpart of the reference driver
(`/root/reference/train.py` + `scripts/run_snet_*.sh`):

    python train.py --model vae   --mode train    --config configs/vae_synthetic.yaml
    python train.py --model union --stage lr  --mode train    --config ...
    python train.py --model union --stage hr  --mode train    --config ... --vq_ckpt <vae ckpt>
    python train.py --model union --stage hr  --mode generate --config ... --count 4

Multi-device data parallelism engages automatically when
``jax.device_count() > 1`` (mesh over ICI; the reference's torchrun/DDP is
replaced by ``shard_map`` + psum — SURVEY.md §2.3).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["vae", "union", "union_3t"],
                   default="vae")
    p.add_argument("--stage", choices=["lr", "hr", "feature"], default="hr")
    p.add_argument("--mode", choices=["train", "generate"], default="train")
    p.add_argument("--config", required=True)
    p.add_argument("--name", default=None)
    p.add_argument("--logs_dir", default=None)
    p.add_argument("--ckpt", default=None, help="checkpoint to load")
    p.add_argument("--vq_ckpt", default=None,
                   help="frozen VAE checkpoint (orbax dir or torch .pth)")
    p.add_argument("--pretrain_ckpt", default=None,
                   help="bootstrap (e.g. lr stage) checkpoint")
    p.add_argument("--category", default="airplane")
    p.add_argument("--count", type=int, default=4,
                   help="number of shapes to generate")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--sampler", choices=["ancestral", "dpmpp"], default=None,
                   help="override diffusion.sampler (dpmpp = "
                        "DPM-Solver++(2M) fast path)")
    p.add_argument("--sample_steps", type=int, default=None,
                   help="override diffusion.ddim_steps for generation")
    p.add_argument("--pos_weight", type=float, default=None,
                   help="override diffusion.lr_pos_weight (occupancy-"
                        "weighted lr split loss; 1.0 = reference parity)")
    p.add_argument("--profile", type=int, default=0,
                   help="capture a jax.profiler trace for N steps "
                        "(written to <run_dir>/profile)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # multi-host: join the multi-controller runtime before any device
    # query (torchrun analogue, `options/base_options.py:106-116`)
    from octfusion_tpu.parallel import dist

    dist.maybe_initialize()

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from octfusion_tpu import config as config_lib
    from octfusion_tpu.data import loader as loader_lib
    from octfusion_tpu.data.dataset import get_dataset
    from octfusion_tpu.data.shapenet import category_5_to_label
    from octfusion_tpu.models.union_solver import UnionSolver
    from octfusion_tpu.models.vae_solver import VAESolver
    from octfusion_tpu.parallel import train_step as pts
    from octfusion_tpu.parallel.mesh import make_mesh
    from octfusion_tpu.utils import ckpt as ckpt_lib
    from octfusion_tpu.utils.visualizer import Visualizer

    cfg = config_lib.load_config(args.config)
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, batch_size=args.batch_size)
        )
    if args.name:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, name=args.name)
        )
    if args.logs_dir:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, logs_dir=args.logs_dir)
        )
    if args.sampler:
        cfg = dataclasses.replace(
            cfg, diffusion=dataclasses.replace(
                cfg.diffusion, sampler=args.sampler)
        )
    if args.sample_steps:
        cfg = dataclasses.replace(
            cfg, diffusion=dataclasses.replace(
                cfg.diffusion, ddim_steps=args.sample_steps)
        )
    if args.pos_weight is not None:
        cfg = dataclasses.replace(
            cfg, diffusion=dataclasses.replace(
                cfg.diffusion, lr_pos_weight=args.pos_weight)
        )
    run_dir = os.path.join(cfg.train.logs_dir, cfg.train.name)
    ckpt_dir = os.path.join(run_dir, "ckpt")
    os.makedirs(run_dir, exist_ok=True)
    # snapshot the config into the run dir (`train.py:211-238` analogue)
    config_lib.dump_config(cfg, os.path.join(run_dir, "config.yaml"))

    key = jax.random.PRNGKey(args.seed)
    # training shards over the GLOBAL device set (mesh over ICI/DCN);
    # generation stripes shapes per process and meshes local devices only
    n_dev = jax.device_count()
    world = jax.process_count()
    is_main = jax.process_index() == 0
    vis = Visualizer(run_dir, enabled=is_main)

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------
    dataset = get_dataset(cfg.data)
    if args.mode == "train":
        # reject samples that would overflow the static octree capacities
        # before they poison a step (`octree/octree.py:113-116` contract)
        from octfusion_tpu.data.dataset import CapacityFilteredDataset

        spec1 = cfg.capacity.octree_spec(cfg.model.depth, cfg.model.full_depth)
        dataset = CapacityFilteredDataset(
            dataset, spec1, edge_factor=cfg.capacity.edge_factor
        )
    global_batch = cfg.data.batch_size
    if args.mode == "train" and n_dev > 1:
        # global batch must divide over the data axis (and over processes,
        # since each process loads its own contiguous shard of rows)
        data_axis = (
            cfg.mesh.data_axis if cfg.mesh.data_axis > 0
            else n_dev // cfg.mesh.model_axis
        )
        q = max(data_axis, world)
        global_batch = max(q, (global_batch // q) * q)
    # rank-striped loader yields this process's rows only
    dl = loader_lib.DataLoader(
        dataset, global_batch // world, cfg.data.shuffle, cfg.train.seed,
        cfg.data.num_workers,
        rank=jax.process_index(), world_size=world,
    )
    data_iter = iter(dl)
    first = next(data_iter)
    per_dev = max(1, global_batch // n_dev) if n_dev > 1 else None
    jb_one = {
        k: jnp.asarray(v[:per_dev])
        for k, v in first.items() if k != "filename"
    }

    def load_vae_params(path, solver):
        if path is None:
            return None
        if path.endswith(".pth"):
            from octfusion_tpu.utils import torch_convert as tc

            m = cfg.model
            return tc.load_vae_checkpoint(
                path, depth=m.depth, depth_stop=m.depth_stop,
                depth_out=m.depth_out, resblk_num=m.resblk_num,
            )
        tree = ckpt_lib.restore(path, None)
        # a saved TrainState: {'step', 'params': <flax variables>, ...}
        return tree["params"]

    # ------------------------------------------------------------------
    # solvers
    # ------------------------------------------------------------------
    total_steps = args.max_steps or (len(dl) * cfg.train.epochs)
    if args.model == "vae":
        solver = VAESolver(cfg)
        state = solver.init_state(key, jb_one, total_steps=total_steps)
        if n_dev > 1:
            mesh = make_mesh(data=cfg.mesh.data_axis, model=cfg.mesh.model_axis)
            step_fn = pts.make_vae_dp_train_step(solver, mesh, total_steps)
        else:
            mesh = None
            step_fn = solver.make_train_step(total_steps)
        vae_params = None
    else:
        if args.model == "union_3t":
            from octfusion_tpu.models.union_3t_solver import Union3TSolver

            solver = Union3TSolver(cfg, stage_flag=args.stage)
        else:
            solver = UnionSolver(cfg, stage_flag=args.stage)
        state = solver.init_state(key, jb_one)
        vae_params = load_vae_params(args.vq_ckpt, solver)
        if vae_params is None and args.stage != "lr":
            print("[warn] no --vq_ckpt given; using random VAE weights")
            vs = VAESolver(cfg)
            vae_params = vs.init_state(key, jb_one, total_steps=10).params
        if n_dev > 1:
            mesh = make_mesh(data=cfg.mesh.data_axis, model=cfg.mesh.model_axis)
            step_fn = pts.make_union_dp_train_step(solver, mesh)
        else:
            mesh = None
            step_fn = solver.make_train_step()

    # stage bootstrap: graft the lr-stage (and hr for feature) subtrees from
    # a previous stage's checkpoint (`octfusion_model_union.py:127-128`)
    if args.pretrain_ckpt and args.model != "vae":
        pre = ckpt_lib.restore(args.pretrain_ckpt, None)
        grafts = {"hr": ("unet_lr",), "feature": ("unet_lr", "unet_hr")}.get(
            args.stage, ()
        )
        for sub in grafts:
            if sub in pre["params"]["params"]:
                state.params["params"][sub] = jax.tree_util.tree_map(
                    jnp.asarray, pre["params"]["params"][sub]
                )
                state.ema_params["params"][sub] = jax.tree_util.tree_map(
                    jnp.asarray, pre["ema_params"]["params"][sub]
                )
                print(f"[*] grafted {sub} from {args.pretrain_ckpt}")

    # auto-resume (`octfusion_model_union.py:150-160`)
    resume = args.ckpt or ckpt_lib.latest_path(ckpt_dir)
    if resume:
        state = ckpt_lib.restore(resume, state)
        print(f"[*] resumed from {resume} at step {int(state.step)}")
        if args.pretrain_ckpt and args.model != "vae" and args.stage != "lr":
            # the resumed state overwrites the graft above: the grafted
            # subtrees (e.g. the frozen lr U-Net inside an hr run) revert to
            # whatever this run originally grafted.  Extending the lr run
            # does NOT propagate into a resumed hr run — retrain hr in a
            # fresh run dir to pick up new lr weights (this silently cost
            # the round-4 conditional campaign its extended lr).
            print("[!] NOTE: --pretrain_ckpt graft is superseded by the "
                  "resumed checkpoint's own (frozen) subtrees; start a "
                  "fresh run dir to re-graft an updated pretrain stage")

    # ------------------------------------------------------------------
    if args.mode == "generate":
        os.makedirs(os.path.join(run_dir, f"results_{args.category}"),
                    exist_ok=True)
        label = None
        if cfg.diffusion.num_classes is not None:
            label = jnp.full((1,), category_5_to_label[args.category],
                             jnp.int32)
        # per-process index striping (`train.py:166-177` in the reference):
        # result i is produced by process i % world, seeds keyed by i so each
        # sample is independently reproducible (`octfusion_model_union.py:372`)
        rank = jax.process_index()
        my_idx = list(range(rank, args.count, world))
        rdir = os.path.join(run_dir, f"results_{args.category}")
        # skip-existing: sample i is a pure function of (seed, i), so a
        # watchdog-restarted generation resumes where it stopped instead
        # of redoing the whole set (25 min at COUNT=256 on one chip)
        done_idx = [i for i in my_idx
                    if os.path.exists(os.path.join(rdir, f"{i}.obj"))]
        if done_idx:
            print(f"[*] {len(done_idx)}/{len(my_idx)} meshes already "
                  f"present; generating the rest")
            my_idx = [i for i in my_idx if i not in set(done_idx)]
        # make_dp_sample runs solver.dp_cascade per device (2-stage union or
        # the 3-hop union_3t cascade).  Work stripes per process, so the
        # generation mesh spans this process's LOCAL devices only.
        n_loc = jax.local_device_count()
        if args.model in ("union", "union_3t") and n_loc > 1 \
                and len(my_idx) > 1:
            # all local devices run full cascades in ONE jitted program
            # (the v5e-8 throughput path; SURVEY §2.3 generation sharding);
            # compact active-cell transfer + host cell marching per shape
            from octfusion_tpu.utils import mesh as mesh_lib
            from octfusion_tpu.utils import sdf as sdf_utils

            res = cfg.solver.resolution
            sscale = cfg.solver.sdf_scale
            cell_cap = 8 * res * res
            mesh = make_mesh(data=n_loc, model=1,
                             devices=jax.local_devices())
            sample_fn = pts.make_dp_sample(solver, mesh, resolution=res)
            for c0 in range(0, len(my_idx), n_loc):
                chunk = my_idx[c0:c0 + n_loc]
                padded = chunk + [chunk[-1]] * (n_loc - len(chunk))
                keys = jnp.stack([
                    jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
                    for i in padded
                ])
                labels = (
                    None if label is None
                    else jnp.broadcast_to(label, (n_loc,))
                )
                ids, vals, counts, grids = sample_fn(
                    state.ema_params, vae_params, keys, labels
                )
                counts_h = np.asarray(counts)
                ids_h, vals_h = sdf_utils._fetch_compact(
                    ids, vals, np.minimum(counts_h, cell_cap), cell_cap
                )
                for j, i in enumerate(chunk):
                    path = os.path.join(rdir, f"{i}.obj")
                    if counts_h[j] > cell_cap:
                        g = np.asarray(grids[j]).astype(np.float32)
                        verts, faces = mesh_lib.marching_tetrahedra(g, 0.0)
                    else:
                        verts, faces = mesh_lib.marching_from_cells(
                            ids_h[j], vals_h[j].astype(np.float32), res, 0.0
                        )
                    if len(verts) == 0:
                        print(f"[!] empty mesh, skipped {path}")
                        continue
                    verts = verts * (2 * sscale / res) - sscale
                    verts = verts * cfg.data_test.point_scale
                    mesh_lib.save_obj(path, verts, faces)
                    print(f"[*] wrote {path}")
            _maybe_log_mem(jax)
            return
        if args.model == "vae":
            for i in my_idx:
                k = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
                path = os.path.join(rdir, f"{i}.obj")
                b = collated_one(dataset, i, jnp)
                solver.reconstruct(state.params, b, k, save_paths=[path],
                                   fast_mesh=True)
                print(f"[*] wrote {path}")
            _maybe_log_mem(jax)
            return
        # pipelined generation: shape i's host marching + D2H overlap
        # shape i+1's device cascade (all submits are async dispatches)
        from octfusion_tpu.utils import mesh as mesh_lib
        from octfusion_tpu.utils import sdf as sdf_utils

        mm = cfg.model
        sscale = cfg.solver.sdf_scale

        def submit_gen(i):
            k = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
            out = solver.sample(
                state.ema_params, vae_params, k, batch_size=1,
                label=label, compute_sdf=False,
            )
            dec = out["decode_out"]
            handle = sdf_utils.extract_meshes_submit(
                dec["reg_voxs"][mm.depth_out], dec["octree_out"],
                mm.full_depth, mm.depth_out, 1,
                size=cfg.solver.resolution, bbmin=-sscale, bbmax=sscale,
            )
            return (handle, out["overflow"]), os.path.join(rdir, f"{i}.obj")

        def finish_gen(hov, path):
            handle, ovf = hov
            if bool(np.asarray(ovf)):
                print(f"[!] static capacity overflow while generating "
                      f"{path} -- raise capacity.finest_cap/edge_factor")
            verts, faces = sdf_utils.extract_meshes_finish(handle)[0]
            if len(verts) == 0:
                print(f"[!] empty mesh, skipped {path}")
                return
            verts = verts * (2 * sscale / cfg.solver.resolution) - sscale
            verts = verts * cfg.data_test.point_scale
            mesh_lib.save_obj(path, verts, faces)
            print(f"[*] wrote {path}")

        pending = None
        for i in my_idx:
            nxt = submit_gen(i)
            if pending is not None:
                finish_gen(*pending)
            pending = nxt
        if pending is not None:
            finish_gen(*pending)
        _maybe_log_mem(jax)
        return

    # ------------------------------------------------------------------
    # training loop (`train.py:33-128` analogue)
    # ------------------------------------------------------------------
    start = int(state.step)
    t0 = time.time()
    last_print_it = start - 1
    prof_until = start + args.profile if args.profile else -1
    # device-side running max of the per-step overflow flag, so an
    # edge-cap/conv-plan overflow at a non-print step still raises at the
    # next print (the loader pre-filter only covers node caps)
    from octfusion_tpu.utils.overflow import OverflowMonitor
    from octfusion_tpu.utils.watchdog import StallWatchdog

    ovf = OverflowMonitor()
    # fail loudly if the device transport wedges (dead relay -> every fetch
    # blocks forever); exit 3 lets a launcher restart + auto-resume
    dog = StallWatchdog()
    for it in range(start, total_steps):
        if args.profile and it == start + 1:  # skip the compile step
            jax.profiler.start_trace(os.path.join(run_dir, "profile"))
        batch = next(data_iter)
        key, k = jax.random.split(key)
        if mesh is not None:
            sb = pts.shard_batch(batch, mesh, vae=args.model == "vae")
            if args.model == "vae":
                state, ld = step_fn(state, sb, k)
            else:
                state, ld = step_fn(state, vae_params, sb, k)
        else:
            jb = {k2: jnp.asarray(v) for k2, v in batch.items()
                  if k2 != "filename"}
            if args.model == "vae":
                state, ld = step_fn(state, jb, k)
            else:
                state, ld = step_fn(state, vae_params, jb, k)

        ovf.update(ld)

        if is_main and it % cfg.train.print_freq == 0:
            # windowed rate (since the previous print), not a cumulative
            # average — the compile-heavy first step otherwise distorts
            # every later t/it line (the r4 depth-9 log needed caveating)
            now = time.time()
            dt = (now - t0) / max(it - last_print_it, 1)
            t0, last_print_it = now, it
            vis.print_current_errors(it, {k2: v for k2, v in ld.items()}, dt)
            ovf.check()
            dog.poke()  # the loss fetch above proved end-to-end progress
        if args.profile and it == prof_until:
            jax.block_until_ready(jax.tree_util.tree_leaves(state.params)[0])
            jax.profiler.stop_trace()
            print(f"[*] profile written to {run_dir}/profile")
        # periodic qualitative eval (`train.py:105-123` display_freq)
        if (
            is_main and cfg.train.display_freq > 0
            and (it + 1) % cfg.train.display_freq == 0
        ):
            ddir = os.path.join(run_dir, "train_temp")
            os.makedirs(ddir, exist_ok=True)
            k2 = jax.random.fold_in(key, it)
            try:
                if args.model == "vae":
                    solver.reconstruct(
                        state.params, collated_one(dataset, it, jnp), k2,
                        resolution=min(cfg.solver.resolution, 128),
                        save_paths=[os.path.join(ddir, f"recon_{it + 1}.obj")],
                    )
                elif args.stage != "lr":
                    solver.sample(
                        state.ema_params, vae_params, k2, batch_size=1,
                        resolution=min(cfg.solver.resolution, 128),
                        save_paths=[os.path.join(ddir, f"sample_{it + 1}.obj")],
                    )
                print(f"[*] display eval written under {ddir}")
            except Exception as e:  # eval must not kill training
                print(f"[warn] display eval failed: {e}")
        if is_main and (it + 1) % cfg.train.save_latest_freq == 0:
            ckpt_lib.save(ckpt_dir, state, it + 1, cfg.train.ckpt_num)
            print(f"[*] saved checkpoint at step {it + 1}")
    dog.stop()
    ovf.check()
    if is_main:
        ckpt_lib.save(ckpt_dir, state, total_steps, cfg.train.ckpt_num)
    dl.stop()
    vis.close()
    _maybe_log_mem(jax)


def _maybe_log_mem(jax):
    """OCTFUSION_LOG_MEM=1: print the device's peak HBM use — the memory
    evidence for the depth-9/10 capacity-math claims (configs/
    vae_snet_depth984.yaml).  Not every backend exposes memory_stats
    (CPU does not); best-effort."""
    if os.environ.get("OCTFUSION_LOG_MEM", "0") != "1":
        return
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        lim = stats.get("bytes_limit")
        if peak is not None:
            print(f"[mem] peak_bytes_in_use {peak / 2**30:.2f} GiB"
                  + (f" / limit {lim / 2**30:.2f} GiB" if lim else ""))
        else:
            print(f"[mem] memory_stats keys: {sorted(stats)}")
    except Exception as e:
        print(f"[mem] unavailable: {e}")


def collated_one(dataset, i, jnp):
    from octfusion_tpu.data.dataset import collate

    b = collate([dataset[i % len(dataset)]])
    return {k: jnp.asarray(v) for k, v in b.items() if k != "filename"}


if __name__ == "__main__":
    main()
