"""A/B the VAE train step's remat policy on the real chip (NEXT.md #4).

`results/vae_step_profile.json` attributed 77% of the full-cap VAE train
step (4921 ms at cap=131072, B=2) to the reverse pass — dominated by the
wholesale res-block remat recompute (the reference's ckpt_conv_wrapper
behaviour, `/root/reference/models/networks/dualoctree_networks/
modules.py:593-641`).  This tool times the SAME
`VAESolver.make_train_step` program under the candidate policies
(`nn/modules.py::remat_transform`):

  full   recompute everything in the backward (round-4 baseline)
  conv   save only GraphConv outputs (checkpoint_name-tagged) — the
         matmuls are not re-run; cheap norm/swish glue still is
  none   no remat (peak-memory reference point; may OOM at full cap —
         an OOM here is itself a measured result)

Variants compile in parallel (the `UnionSolver.warm_compile` trick) and
the JSON is rewritten after every timed variant, so a deadline kill
leaves partial committable results.

    python tools/profile_remat_ab.py [--cap 131072] [--batch 2] \
        [--out results/vae_remat_ab.json] [--deadline 1800]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def write_json(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=131072)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--policies", default="full,conv,none")
    ap.add_argument("--out", default="results/vae_remat_ab.json")
    ap.add_argument("--deadline", type=float, default=1800.0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize pins axon)")
    args = ap.parse_args()
    t_start = time.time()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()

    from octfusion_tpu.config import CapacityConfig, Config, SolverConfig
    from octfusion_tpu.data.dataset import SyntheticDataset, collate
    from octfusion_tpu.models.vae_solver import VAESolver

    cfg0 = Config(
        solver=SolverConfig(resolution=64),
        capacity=CapacityConfig(finest_cap=args.cap),
    )
    key = jax.random.PRNGKey(0)
    ds = SyntheticDataset(size=args.batch, point_sample_num=4096,
                          points_per_shape=16384)
    jb = {k: jnp.asarray(v) for k, v in collate(
        [ds[i] for i in range(args.batch)]).items() if k != "filename"}
    jb1 = {k: v[:1] for k, v in jb.items()}

    policies = [p.strip() for p in args.policies.split(",") if p.strip()]
    result = {
        "cap": args.cap, "batch": args.batch, "iters": args.iters,
        "variants_ms": {}, "compile_s": {}, "notes": (
            "identical VAESolver.make_train_step program per policy "
            "(same params/batch/key); compiled in parallel over the axon "
            "tunnel, timed serially; medians of per-call walls, "
            "D2H-synced; baseline attribution in vae_step_profile.json"
        ),
    }

    # one solver per policy; identical init (same PRNG key + shapes), so
    # the timed programs differ ONLY in the remat policy
    solvers, states, steps = {}, {}, {}
    for p in policies:
        cfg = dataclasses.replace(
            cfg0, model=dataclasses.replace(cfg0.model, remat_policy=p))
        if p == "none":
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(
                    cfg.model, use_checkpoint=False))
        solvers[p] = VAESolver(cfg)
    state0 = solvers[policies[0]].init_state(key, jb1, total_steps=1000)
    for p in policies:
        states[p] = state0
        steps[p] = solvers[p].make_train_step(total_steps=1000)

    compiled, lock = {}, threading.Lock()

    def compile_one(p):
        t0 = time.time()
        try:
            c = steps[p].lower(state0, jb, key).compile()
            with lock:
                compiled[p] = c
                result["compile_s"][p] = round(time.time() - t0, 1)
            print(f"[remat_ab] compiled {p} in {time.time() - t0:.1f}s",
                  flush=True)
        except Exception as e:
            with lock:
                result["compile_s"][p] = f"failed: {type(e).__name__}"
            print(f"[remat_ab] {p} compile failed: {e!r}", flush=True)

    print(f"[remat_ab] compiling {len(policies)} policies in parallel "
          f"(deadline {args.deadline:.0f}s) ...", flush=True)
    for p in policies:
        threading.Thread(target=compile_one, args=(p,), daemon=True).start()
    while (time.time() - t_start) < args.deadline - 120:
        with lock:
            if len(result["compile_s"]) == len(policies):
                break
        time.sleep(5)
    with lock:
        for p in policies:
            result["compile_s"].setdefault(p, "deadline")
    result["wall_s"] = round(time.time() - t_start, 1)
    write_json(args.out, result)  # compile record survives a deadline kill

    for p in policies:
        if p not in compiled:
            continue
        fn = compiled[p]
        st = states[p]
        try:
            st2, ld = fn(st, jb, key)
            sync(ld["loss"])
            result.setdefault("loss_first_step", {})[p] = float(
                np.asarray(ld["loss"]))
            ts = []
            for i in range(args.iters):
                t0 = time.time()
                st2, ld = fn(st2, jb, jax.random.fold_in(key, i))
                sync(ld["loss"])
                ts.append(time.time() - t0)
            result["variants_ms"][p] = round(float(np.median(ts)) * 1e3, 1)
            print(f"[remat_ab] {p}: {result['variants_ms'][p]} ms "
                  f"(n={args.iters})", flush=True)
        except Exception as e:  # OOM at "none" is a result, not a crash
            result["variants_ms"][p] = f"failed: {type(e).__name__}"
            print(f"[remat_ab] {p} run failed: {e!r}", flush=True)
        vm = result["variants_ms"]
        if isinstance(vm.get("full"), float) and isinstance(
                vm.get("conv"), float):
            result["derived"] = {
                "conv_win_ms": round(vm["full"] - vm["conv"], 1),
                "conv_win_pct": round(
                    100 * (vm["full"] - vm["conv"]) / vm["full"], 1),
            }
        result["wall_s"] = round(time.time() - t_start, 1)
        write_json(args.out, result)

    print(f"[remat_ab] done in {result.get('wall_s', 0)}s -> {args.out}",
          flush=True)


if __name__ == "__main__":
    main()
