"""Break down the full-capacity VAE train step (VERDICT r4 ask #7).

The r4 bench measured the full-cap (131072-node, B=2) VAE train step at
4928 ms (`logs/bench_train_steps.txt`) with no attribution.  This tool
measures ablated variants of the same step and derives where the time
goes:

  full        the real `VAESolver.make_train_step` program (same shapes
              as benchmarks/bench_train_steps.py; spatial_grad='analytic'
              — the one-pass `ops/mpu.mpu_eval_grad` default)
  full_jvp    same step with spatial_grad='jvp' (the original 4-pass
              primal + 3-forward-JVP formulation, per target depth, no
              corner-cache sharing) — the before/after of the analytic
              optimisation, measured in the same run
  fwd         forward loss only (no value_and_grad / optimizer)
  sdf_nograd  SDF regression keeps the MPU *value* term but drops the
              3 forward-mode JVPs of `losses.mpu_with_grad` -> isolates
              the spatial-gradient supervision cost
  no_sdf      split cross-entropy + KL only (no MPU at all) -> isolates
              the whole MPU eval + JVP + their backward
  graph       batch_to_graph alone (octree build + dual graph), the
              data-prep prefix shared by every variant

Derived columns (medians, ms):
  spatial_grad_cost = full - sdf_nograd  (gradient supervision on top of
                                          the SDF value term)
  mpu_cost          = full - no_sdf      (the whole MPU + its backward)
  bwd_opt_cost      = full - fwd         (reverse pass + optimizer)
  analytic_win      = full_jvp - full    (the one-pass analytic gradient
                                          vs the 4-pass JVP formulation)

Remote axon compiles are slow (the full step measured 897 s cold) and
the r5 queue bounds this job at 3000 s, so variants compile in PARALLEL
(the same trick as `UnionSolver.warm_compile`, which cut cold setup
957 -> 328 s) and the JSON is (re)written after every variant that
completes — a deadline kill still leaves partial, committed-able
results.  Reference workload this gates: 300-epoch VAE training,
`/root/reference/scripts/run_snet_vae.sh:22-28`.

    python tools/profile_vae_step.py [--cap 131072] [--batch 2] \
        [--out results/vae_step_profile.json] [--deadline 2700]
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
    ap.add_argument("--out", default="results/vae_step_profile.json")
    ap.add_argument("--deadline", type=float, default=2700.0,
                    help="seconds from start after which uncompiled "
                         "variants are abandoned")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize pins axon; "
                         "the env var alone is not enough)")
    args = ap.parse_args()
    t_start = time.time()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()

    from octfusion_tpu.config import CapacityConfig, Config, SolverConfig
    from octfusion_tpu.data.dataset import SyntheticDataset, collate
    from octfusion_tpu.models.common import batch_to_graph, flatten_pos
    from octfusion_tpu.models.vae_solver import VAESolver
    from octfusion_tpu.nn import losses
    from octfusion_tpu.ops import mpu as mpu_ops

    cfg = Config(
        solver=SolverConfig(resolution=64),
        capacity=CapacityConfig(finest_cap=args.cap),
    )
    key = jax.random.PRNGKey(0)
    ds = SyntheticDataset(size=args.batch, point_sample_num=4096,
                          points_per_shape=16384)
    jb = {k: jnp.asarray(v) for k, v in collate(
        [ds[i] for i in range(args.batch)]).items() if k != "filename"}
    jb1 = {k: v[:1] for k, v in jb.items()}

    vs = VAESolver(cfg)
    state = vs.init_state(key, jb1, total_steps=1000)
    m = cfg.model

    # ---- ablated loss variants (mirror VAESolver.loss_fn) -----------------
    def loss_variant(mode):
        def loss_fn(params, batch, k):
            _, g = batch_to_graph(
                batch["points"], batch["normals"], vs.spec1, vs.edge_factor
            )
            out = vs.vae.apply(params, g, g, k)
            output = losses.octree_split_loss(out["logits"],
                                              out["octree_out"])
            if mode == "sdf_nograd":
                pos, pb = flatten_pos(batch["pos"])
                sdf_gt = batch["sdf"].reshape(-1)
                for d in range(m.depth_stop, m.depth_out + 1):
                    sdf, _ = mpu_ops.mpu_eval(
                        pos, pb, out["reg_voxs"][d], out["octree_out"],
                        m.full_depth, d,
                    )
                    output[f"sdf_loss_{d}"] = (
                        jnp.mean((sdf - sdf_gt) ** 2) * 200.0
                    )
            output["kl_loss"] = cfg.loss.kl_weight * out["kl_loss"]
            total = sum(v for kk, v in output.items() if "loss" in kk)
            output["loss"] = total
            return output["loss"], output

        return loss_fn

    def make_step(loss_fn, total_steps=1000):
        opt = vs.make_optimizer(total_steps)

        def step(st, batch, k):
            (_, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params, batch, k
            )
            updates, opt_state = opt.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return (
                st.replace(step=st.step + 1, params=params,
                           opt_state=opt_state),
                ld,
            )

        return jax.jit(step)

    step_args = (state, jb, key)
    fwd = jax.jit(lambda p, b, k: vs.loss_fn(p, b, k)[0])
    graph = jax.jit(
        lambda b: batch_to_graph(b["points"], b["normals"], vs.spec1,
                                 vs.edge_factor)[1]
    )

    import dataclasses

    cfg_jvp = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, spatial_grad="jvp"))
    vs_jvp = VAESolver(cfg_jvp)

    variants = {
        "full": (vs.make_train_step(total_steps=1000), step_args, "step"),
        "full_jvp": (vs_jvp.make_train_step(total_steps=1000), step_args,
                     "step"),
        "fwd": (fwd, (state.params, jb, key), "plain"),
        "sdf_nograd": (make_step(loss_variant("sdf_nograd")), step_args,
                       "step"),
        "no_sdf": (make_step(loss_variant("no_sdf")), step_args, "step"),
        "graph": (graph, (jb,), "plain"),
    }

    result = {
        "cap": args.cap, "batch": args.batch, "iters": args.iters,
        "depth_stop": m.depth_stop, "depth_out": m.depth_out,
        "full_depth": m.full_depth,
        "variants_ms": {}, "compile_s": {}, "notes": (
            "variants compiled in parallel over the axon tunnel; timings "
            "taken serially after all compiles finished (or the deadline "
            "passed); medians of per-call walls, D2H-synced"
        ),
    }

    # daemon threads (not ThreadPoolExecutor): a wedged remote compile must
    # not block process exit past the queue's `timeout 3000` bound
    compiled, lock = {}, threading.Lock()

    def compile_one(name):
        fn, a, _kind = variants[name]
        t0 = time.time()
        try:
            c = fn.lower(*a).compile()
            with lock:
                compiled[name] = c
                result["compile_s"][name] = round(time.time() - t0, 1)
            print(f"[profile] compiled {name} in {time.time() - t0:.1f}s",
                  flush=True)
        except Exception as e:
            with lock:
                result["compile_s"][name] = f"failed: {type(e).__name__}"
            print(f"[profile] {name} compile failed: {e!r}", flush=True)

    print(f"[profile] compiling {len(variants)} variants in parallel "
          f"(deadline {args.deadline:.0f}s) ...", flush=True)
    for n in variants:
        threading.Thread(target=compile_one, args=(n,), daemon=True).start()
    while (time.time() - t_start) < args.deadline - 90:
        with lock:
            if len(result["compile_s"]) == len(variants):
                break
        time.sleep(5)
    with lock:
        for n in variants:
            result["compile_s"].setdefault(n, "deadline")

    # ---- time serially, most-important first -------------------------------
    for name in ["full", "full_jvp", "sdf_nograd", "no_sdf", "fwd", "graph"]:
        if name not in compiled:
            continue
        fn = compiled[name]
        _, a, kind = variants[name]
        out = fn(*a)
        sync(out)
        ts = []
        st = a[0]
        for i in range(args.iters):
            t0 = time.time()
            if kind == "step":
                st2, ld = fn(st, jb, jax.random.fold_in(key, i))
                sync(ld["loss"])
                st = st2
            else:
                sync(fn(*a))
            ts.append(time.time() - t0)
        result["variants_ms"][name] = round(float(np.median(ts)) * 1e3, 1)
        print(f"[profile] {name}: {result['variants_ms'][name]} ms "
              f"(n={args.iters})", flush=True)
        vm = result["variants_ms"]
        if "full" in vm:
            d = {}
            if "sdf_nograd" in vm:
                d["spatial_grad_cost_ms"] = round(
                    vm["full"] - vm["sdf_nograd"], 1)
            if "full_jvp" in vm:
                d["analytic_win_ms"] = round(vm["full_jvp"] - vm["full"], 1)
            if "no_sdf" in vm:
                d["mpu_cost_ms"] = round(vm["full"] - vm["no_sdf"], 1)
            if "fwd" in vm:
                d["bwd_opt_cost_ms"] = round(vm["full"] - vm["fwd"], 1)
            if "graph" in vm:
                d["graph_build_ms"] = vm["graph"]
            result["derived"] = d
        result["wall_s"] = round(time.time() - t_start, 1)
        write_json(args.out, result)

    print(f"[profile] done in {result.get('wall_s', 0)}s -> {args.out}",
          flush=True)


if __name__ == "__main__":
    main()
