"""hr diffusion TRAIN step with vs without fused-conv plans (plans built
inside the jitted step — training topology changes per batch).

    python benchmarks/bench_hr_train.py [finest_cap]
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
    import jax
    import jax.numpy as jnp

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()
    import os

    from octfusion_tpu.config import CapacityConfig, Config, SolverConfig
    from octfusion_tpu.data.dataset import SyntheticDataset, collate
    from octfusion_tpu.models import union_solver as us
    from octfusion_tpu.models.vae_solver import VAESolver

    cfg = Config(
        solver=SolverConfig(resolution=64),
        capacity=CapacityConfig(finest_cap=cap),
    )
    key = jax.random.PRNGKey(0)
    bsz = 2
    ds = SyntheticDataset(size=bsz, point_sample_num=512,
                          points_per_shape=16384)
    jb = {k: jnp.asarray(v) for k, v in collate(
        [ds[i] for i in range(bsz)]).items() if k != "filename"}
    vae_solver = VAESolver(cfg)
    vstate = vae_solver.init_state(key, {k: v[:1] for k, v in jb.items()},
                                   total_steps=10)

    for mode, env in (("xla ", "0"), ("plan", "1")):
        os.environ["OCTFUSION_FUSED_TRAIN"] = env
        solver = us.UnionSolver(cfg, stage_flag="hr")
        state = solver.init_state(key, {k: v[:1] for k, v in jb.items()})
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
        print(f"hr train step B={bsz} {mode}: {np.median(ts) * 1e3:.1f} ms "
              f"(cold {cold:.1f}s, loss {float(ld['loss']):.4f})")


if __name__ == "__main__":
    main()
