"""End-to-end generation benchmark (driver contract: prints ONE JSON line).

Measures seconds per generated shape for the FULL OctFusion cascade at the
reference's headline configuration — depth-8 octree at full static capacity
(131072 finest nodes, covering real ShapeNet shapes), 200-step lr sampling +
200-step hr sampling (fused Pallas graph convs) + growing VAE decode +
256^3 SDF grid (dense trilinear-resampling MPU) + device-side active-cell
extraction + host marching-tetrahedra mesh — on whatever accelerator JAX
provides (the real TPU under the driver).

Weights are randomly initialised, so the decoded SDF is noise and would
make iso-surfacing pathological (every cell active).  To keep meshing in
the timed path at *realistic* cost, the per-node MPU plane values are
replaced after decode with an analytic lumpy-sphere field over the SAME
octree (identical array shapes, identical device work for every stage);
only the marching workload becomes shape-realistic.  Everything else is
exactly inference.

North-star target (BASELINE.md): < 2 s / shape on v5e-8.  This prints the
single-chip number; generation is embarrassingly parallel across chips
(make_dp_sample, one cascade per chip), so v5e-8 throughput is ~1/8 of it —
reported as an extra field, not as the headline.
"""

import json
import os
import sys
import time


def main():
    t_setup = time.time()
    import jax
    import numpy as np

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()
    import jax.numpy as jnp

    from octfusion_tpu.config import CapacityConfig, Config, SolverConfig
    from octfusion_tpu.data.dataset import SyntheticDataset, collate
    from octfusion_tpu.models.union_solver import UnionSolver
    from octfusion_tpu.models.vae_solver import VAESolver
    from octfusion_tpu.octree import morton
    from octfusion_tpu.utils import sdf as sdf_utils

    steps = int(os.environ.get("BENCH_STEPS", "200"))
    resolution = int(os.environ.get("BENCH_RESOLUTION", "256"))
    finest_cap = int(os.environ.get("BENCH_FINEST_CAP", "131072"))
    n_iters = int(os.environ.get("BENCH_ITERS", "5"))
    # Cross-shape batching: B full cascades share one program (per-sample
    # capacities, so device compute scales ~linearly, but program dispatch,
    # plan builds and the D2H/marching tail amortise).  The reported value
    # stays per-shape (elapsed / (iters * B)).
    bench_batch = int(os.environ.get("BENCH_BATCH", "1"))

    # Fail fast (still printing the contract's one JSON line) if the device
    # transport is wedged — a dead TPU relay makes every op block forever,
    # which would otherwise hang the driver.  The probe budget covers a cold
    # remote compile of the trivial program (50-300 s).
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "600"))
    if probe_timeout > 0:
        import threading

        probe_ok = threading.Event()

        def _probe():
            x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((128, 128)))
            np.asarray(x.reshape(-1)[:1])
            probe_ok.set()

        threading.Thread(target=_probe, daemon=True).start()
        if not probe_ok.wait(probe_timeout):
            print(
                json.dumps(
                    {
                        "metric": (
                            "sec_per_shape_depth8_"
                            f"cap{finest_cap // 1024}k_e2e_mesh"
                        ),
                        "value": None,
                        "unit": "s/shape",
                        "vs_baseline": None,
                        "error": (
                            f"device unreachable: a trivial jit did not "
                            f"complete within {probe_timeout:.0f}s (wedged "
                            "relay/tunnel?)"
                        ),
                    }
                )
            )
            sys.exit(2)

    cfg = Config(
        solver=SolverConfig(resolution=resolution),
        capacity=CapacityConfig(finest_cap=finest_cap),
    )
    m = cfg.model

    key = jax.random.PRNGKey(0)
    ds = SyntheticDataset(size=1, point_sample_num=512, points_per_shape=16384)
    batch = collate([ds[0]])
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "filename"}

    phase_t = {"start": time.time()}

    def phase(name):
        now = time.time()
        last = phase_t.pop("_last", phase_t["start"])
        phase_t[name] = now - last
        phase_t["_last"] = now

    vae_solver = VAESolver(cfg)
    solver = UnionSolver(cfg, stage_flag="hr")

    # Param-init cache: flax init compiles a full forward pass per network
    # (~400 s of the round-2 setup) yet its output is DETERMINISTIC given
    # PRNGKey(0) and the config, so persist the initialised states and skip
    # the init compiles on repeat runs.  Values are bit-identical to a cold
    # init; delete .bench_cache/ (or BENCH_PARAM_CACHE=0) to reproduce cold.
    import pickle

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    cache_path = os.path.join(
        cache_dir, f"states_cap{finest_cap}_res{resolution}.pkl"
    )
    use_cache = os.environ.get("BENCH_PARAM_CACHE", "1") != "0"
    if use_cache and os.path.exists(cache_path):
        with open(cache_path, "rb") as fh:
            host_states = pickle.load(fh)
        vae_state, state = jax.tree_util.tree_map(jnp.asarray, host_states)
        phase("init_restore")
    else:
        vae_state = vae_solver.init_state(key, jb, total_steps=10)
        phase("init_vae")
        state = solver.init_state(key, jb)
        phase("init_union")
        if use_cache:
            os.makedirs(cache_dir, exist_ok=True)
            host_states = jax.tree_util.tree_map(
                np.asarray, (vae_state, state)
            )
            with open(cache_path, "wb") as fh:
                pickle.dump(host_states, fh)

    def analytic_reg(octree):
        """Per-node lumpy-sphere planes: same shapes as the decoder output,
        realistic iso-surface workload."""
        out = {}
        for dd in range(m.full_depth, m.depth_out + 1):
            x, y, z, _ = octree.xyzb(dd)
            s = 2**dd
            c = (jnp.stack([x, y, z], -1).astype(jnp.float32) + 0.5) / s
            c = c * 2.0 - 1.0
            r = jnp.linalg.norm(c, axis=-1, keepdims=True)
            n = c / jnp.maximum(r, 1e-9)
            rad = 0.55 + 0.08 * jnp.sin(5 * c[:, :1]) * jnp.cos(4 * c[:, 1:2])
            reg = jnp.concatenate([n, r - rad], -1)
            mask = octree.node_mask(dd)[:, None]
            out[dd] = jnp.where(mask, reg, 0.0)
        return out

    analytic_reg_jit = jax.jit(analytic_reg)

    vlevel = os.environ.get("BENCH_VERBOSE", "0")
    verbose = vlevel != "0"

    def vsync(tag, x, t0):
        # level 2 syncs inside submit (breaks pipelining -- diagnostics only)
        if vlevel == "2":
            np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])
            sys.stderr.write(f"  [{tag}] {time.time() - t0:.3f}s\n")
            return time.time()
        return t0

    last_nnum = {}

    def submit(seed, use_solver=None, use_steps=None):
        """Dispatch one shape's FULL device pipeline without host syncs."""
        t0 = time.time()
        out = (use_solver or solver).sample(
            state.ema_params, vae_state.params, jax.random.PRNGKey(seed),
            batch_size=bench_batch, steps=use_steps or steps,
            compute_sdf=False,
        )
        octree_out = out["decode_out"]["octree_out"]
        # occupancy of the grown octree: quantifies how the random-weight
        # VAE's split predictions compare to trained-shape node counts
        # (device scalars; fetched lazily at the end)
        last_nnum.clear()
        last_nnum.update(
            {dd: octree_out.nnum[dd] for dd in range(m.full_depth,
                                                     m.depth_out + 1)}
        )
        t0 = vsync("cascade", octree_out.keys[m.depth_out], t0)
        reg = analytic_reg_jit(octree_out)
        t0 = vsync("analytic_reg", reg[m.depth_out], t0)
        return sdf_utils.extract_meshes_submit(
            reg, octree_out, m.full_depth, m.depth_out, bench_batch,
            size=resolution,
            bbmin=-cfg.solver.sdf_scale, bbmax=cfg.solver.sdf_scale,
        )

    def finish(handle):
        t0 = time.time()
        meshes = sdf_utils.extract_meshes_finish(handle)
        if verbose:
            sys.stderr.write(f"  [mesh host] {time.time() - t0:.3f}s\n")
        verts, faces = meshes[-1]
        return len(verts), len(faces)

    def submit_timed(seed):
        t0 = time.time()
        h = submit(seed)
        if verbose:
            sys.stderr.write(f"  [submit dispatch] {time.time() - t0:.3f}s\n")
        return h

    # fast-path solver built up front so its programs join the parallel warm
    use_fast = os.environ.get("BENCH_FAST", "1") != "0"
    # 25 is the quality-validated fast protocol: METRICS_r04.md scores
    # dpmpp-25 within the eval noise band of ancestral-100 on 1-NNA/MMD/
    # FID (COV-EMD dips 0.46->0.39, recorded there).
    fast_steps = int(os.environ.get("BENCH_FAST_STEPS", "25"))
    solver_fast = None
    if use_fast:
        import dataclasses

        cfg_fast = dataclasses.replace(
            cfg, diffusion=dataclasses.replace(cfg.diffusion, sampler="dpmpp")
        )
        solver_fast = UnionSolver(cfg_fast, stage_flag="hr")

    # Parallel AOT warm (BENCH_PARALLEL_WARM=0 restores the serial cold
    # path): the ~7 distinct cascade programs compile at 50-300 s each
    # through the tunnel and the chain's shapes are static, so eval_shape
    # derives every stage's input specs host-side and all programs
    # lower+compile concurrently — cold setup drops from the sum of compile
    # times toward the max (the bulk of round-3's 957 s cold setup).
    if os.environ.get("BENCH_PARALLEL_WARM", "1") != "0":
        from concurrent.futures import ThreadPoolExecutor

        from octfusion_tpu.utils.sdf import _sdf_compact_device

        fd = m.full_depth
        s8 = 2**fd
        split_spec = jax.ShapeDtypeStruct(
            (bench_batch, s8, s8, s8, 8), jnp.float32)
        _, g_spec = jax.eval_shape(solver._grow_fn(bench_batch), split_spec)
        lvl = g_spec.level(m.depth_stop)
        code_spec = jax.ShapeDtypeStruct((lvl.g_cap, m.embed_dim),
                                         jnp.float32)
        dec_spec = jax.eval_shape(
            solver._decode_fn(), vae_state.params, code_spec, g_spec)
        oct_spec = dec_spec["octree_out"]
        reg_spec = jax.eval_shape(analytic_reg, oct_spec)
        cell_cap = 8 * resolution * resolution

        def warm_extract():
            _sdf_compact_device.lower(
                reg_spec, oct_spec, m.full_depth, m.depth_out, resolution,
                jnp.float32(-cfg.solver.sdf_scale),
                jnp.float32(cfg.solver.sdf_scale), cell_cap, 0.0,
            ).compile()

        warm_workers = int(os.environ.get("BENCH_WARM_WORKERS", "8"))
        with ThreadPoolExecutor(max_workers=warm_workers) as ex:
            futs = solver.warm_compile(
                state.ema_params, vae_state.params, batch_size=bench_batch,
                steps=steps, executor=ex,
            )
            if solver_fast is not None:
                # grow/decode are sampler-independent: already covered above
                futs += solver_fast.warm_compile(
                    state.ema_params, vae_state.params,
                    batch_size=bench_batch, steps=fast_steps, executor=ex,
                    stages=("lr", "hr"),
                )
            futs.append(ex.submit(warm_extract))
            futs.append(
                ex.submit(lambda: analytic_reg_jit.lower(oct_spec).compile())
            )
            # a failed parallel compile (the axon compile helper SIGKILLs
            # under memory pressure when several full-cap programs compile
            # concurrently — observed 2026-08-20) must degrade to the
            # serial compile in the warm-up run below, not crash the bench
            for f in futs:
                try:
                    f.result()
                except Exception as e:
                    sys.stderr.write(
                        f"[bench] parallel warm compile failed "
                        f"({type(e).__name__}); that program will compile "
                        f"serially in the warm-up run\n")
        phase("warmup_parallel")

    # warm-up run (cache hits after a parallel warm; compiles serially
    # otherwise)
    h0 = submit(0)
    phase("warmup_submit")     # traces+compiles lr/grow/hr/decode/extract
    nv, nf = finish(h0)
    phase("warmup_finish")

    # steady-state generation: shape i's host marching + D2H overlap shape
    # i+1's device work (async dispatch; one device queue, so per-shape
    # device latency is unchanged -- this measures honest throughput).
    # Per-iteration wall times are kept so the headline can be a MEDIAN
    # with min/max spread: the shared axon pool swings up to ~4x with
    # co-tenant load (r4 measured 4.73 vs 18.9 s/shape on the same
    # program hours apart), so a single-draw mean is not a robust
    # round-over-round number.
    iter_s = []
    t0 = time.time()
    pending = submit_timed(1)
    for i in range(n_iters):
        ti = time.time()
        nxt = submit_timed(i + 2) if i + 1 < n_iters else None
        nv, nf = finish(pending)
        iter_s.append(time.time() - ti)
        if verbose:
            sys.stderr.write(f"  [iter] {iter_s[-1]:.3f}s\n")
        pending = nxt
    dt_total = time.time() - t0
    dt = dt_total / (n_iters * bench_batch)
    dt_median = float(np.median(iter_s)) / bench_batch

    # secondary metric: the DPM-Solver++(2M) fast path (same cascade;
    # scored quality parity vs ancestral measured in METRICS_r04.md).
    # Opt out with BENCH_FAST=0.
    dt_fast = None
    t_fast_total = 0.0
    fast_iter_s = []
    if solver_fast is not None:
        t_fast0 = time.time()
        finish(submit(0, use_solver=solver_fast, use_steps=fast_steps))
        phase("warmup_fast")
        t0 = time.time()
        pending = submit(1, use_solver=solver_fast, use_steps=fast_steps)
        for i in range(n_iters):
            ti = time.time()
            nxt = (submit(i + 2, use_solver=solver_fast,
                          use_steps=fast_steps)
                   if i + 1 < n_iters else None)
            finish(pending)
            fast_iter_s.append(time.time() - ti)
            pending = nxt
        dt_fast = float(np.median(fast_iter_s)) / bench_batch
        t_fast_total = time.time() - t_fast0

    print(
        json.dumps(
            {
                "metric": (
                    f"sec_per_shape_depth8_cap{finest_cap // 1024}k_e2e_mesh"
                ),
                # headline = median of the n_iters per-shape walls; the
                # mean and min/max spread are reported alongside so
                # round-over-round deltas can be read against the pool's
                # own swing (narrate a delta only when outside it)
                "value": round(dt_median, 4),
                "unit": "s/shape",
                "vs_baseline": round(dt_median / 2.0, 4),
                "mean_s_per_shape": round(dt, 4),
                "iters_s_min_max": [
                    round(min(iter_s) / bench_batch, 4),
                    round(max(iter_s) / bench_batch, 4),
                ],
                "n_iters": n_iters,
                "v5e8_throughput_est": round(dt_median / 8.0, 4),
                "mesh_verts_last": int(nv),
                "octree_nnum": {
                    str(dd): int(v) for dd, v in last_nnum.items()
                },
                "node_cap_finest": finest_cap,
                "batch": bench_batch,
                f"dpmpp_{fast_steps}step_s_per_shape": (
                    round(dt_fast, 4) if dt_fast is not None else None
                ),
                f"dpmpp_{fast_steps}step_min_max": (
                    [round(min(fast_iter_s) / bench_batch, 4),
                     round(max(fast_iter_s) / bench_batch, 4)]
                    if fast_iter_s else None
                ),
                # cold/warm split: everything before the first timed shape
                # (imports, data, init, lower+compile).  VERDICT r3 #7 asks
                # for a logged cold run < 500 s of setup.
                "setup_s": round(
                    time.time() - t_setup - dt_total - t_fast_total, 1
                ),
            }
        )
    )
    phase_str = ", ".join(
        f"{k} {v:.1f}s" for k, v in phase_t.items()
        if k not in ("start", "_last")
    )
    # same subtraction as the JSON setup_s field (they disagreed when
    # BENCH_BATCH > 1 before; advisor r4)
    sys.stderr.write(
        f"[bench] setup+compile "
        f"{time.time() - t_setup - dt_total - t_fast_total:.1f}s "
        f"({phase_str}), "
        f"devices={jax.devices()}, last mesh {nv} verts / {nf} faces\n"
    )
    del morton, np


if __name__ == "__main__":
    main()
