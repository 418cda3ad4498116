"""VAE and lr-diffusion TRAIN steps at full capacity (PERF.md training
table; the hr step has its own fused-vs-XLA bench in bench_hr_train.py).

    python benchmarks/bench_train_steps.py [finest_cap] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import jax
    import jax.numpy as jnp

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()

    from octfusion_tpu.config import CapacityConfig, Config, SolverConfig
    from octfusion_tpu.data.dataset import SyntheticDataset, collate
    from octfusion_tpu.models.union_solver import UnionSolver
    from octfusion_tpu.models.vae_solver import VAESolver

    cfg = Config(
        solver=SolverConfig(resolution=64),
        capacity=CapacityConfig(finest_cap=cap),
    )
    key = jax.random.PRNGKey(0)
    ds = SyntheticDataset(size=bsz, point_sample_num=4096,
                          points_per_shape=16384)
    jb = {k: jnp.asarray(v) for k, v in collate(
        [ds[i] for i in range(bsz)]).items() if k != "filename"}
    jb1 = {k: v[:1] for k, v in jb.items()}

    # VAE train step (fwd-mode spatial grads, 4096 SDF pts/shape)
    vs = VAESolver(cfg)
    vstate = vs.init_state(key, jb1, total_steps=1000)
    vstep = vs.make_train_step(total_steps=1000)
    t0 = time.time()
    vstate, ld = vstep(vstate, jb, key)
    sync(ld["loss"])
    cold = time.time() - t0
    ts = []
    for i in range(5):
        t0 = time.time()
        vstate, ld = vstep(vstate, jb, jax.random.fold_in(key, i))
        sync(ld["loss"])
        ts.append(time.time() - t0)
    print(f"vae train step B={bsz} cap={cap}: {np.median(ts) * 1e3:.1f} ms "
          f"(cold {cold:.1f}s, loss {float(ld['loss']):.2f})")

    # lr train step (dense 16^3 voxel U-Net; octree->split on device)
    solver = UnionSolver(cfg, stage_flag="lr")
    state = solver.init_state(key, jb1)
    step = solver.make_train_step()
    t0 = time.time()
    state, ld = step(state, vstate.params, jb, key)
    sync(ld["loss"])
    cold = time.time() - t0
    ts = []
    for i in range(5):
        t0 = time.time()
        state, ld = step(state, vstate.params, jb,
                         jax.random.fold_in(key, i))
        sync(ld["loss"])
        ts.append(time.time() - t0)
    print(f"lr  train step B={bsz} cap={cap}: {np.median(ts) * 1e3:.1f} ms "
          f"(cold {cold:.1f}s, loss {float(ld['loss']):.4f})")


if __name__ == "__main__":
    main()
