"""hr denoise-step breakdown at full capacity on the current backend.

    python benchmarks/bench_hr_step.py [finest_cap] [use_plans]

Times one jitted hr U-Net apply (the body of the 200-step sampler) with and
without fused-conv plans, plus a conv-only chain for attribution.
"""

import sys
import time

import numpy as np


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    import jax
    import jax.numpy as jnp

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()
    from octfusion_tpu.config import CapacityConfig
    from octfusion_tpu.models.common import batch_to_graph_jit
    from octfusion_tpu.nn.unet_union import UNetUnion, UnionConfig
    from octfusion_tpu.octree.dual_graph import with_conv_plans

    cfg = UnionConfig()
    model = UNetUnion(cfg, stage_flag="hr")
    spec = CapacityConfig(finest_cap=cap).octree_spec(8, 4, 1)

    rng = np.random.RandomState(0)
    v = rng.normal(size=(65536, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = 0.6 + 0.15 * np.sin(5 * v[:, 0]) * np.cos(4 * v[:, 1])
    _, g = batch_to_graph_jit(
        jnp.asarray((r[:, None] * v).astype(np.float32))[None],
        jnp.asarray(v.astype(np.float32))[None], spec, 9, up_to=6,
    )
    print(f"devices={jax.devices()} cap={cap}")

    lvl = g.level(6)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (lvl.g_cap, 3), jnp.float32)
    x = jnp.where(lvl.node_mask[:, None], x, 0)
    t = jnp.zeros((1,), jnp.float32)
    s = 2**4
    lr_x = jnp.zeros((1, s, s, s, 8), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, lr_x, x, g, t, method=UNetUnion.warmup)
    )(key)

    gp = jax.jit(with_conv_plans)(g)
    sync(gp.level(6).conv_plan.f_offs)

    for name, graph in (("xla  ", g), ("plans", gp)):
        fn = jax.jit(
            lambda p, x, t, graph=graph: model.apply(p, "hr", x, t, g=graph)
        )
        t0 = time.time()
        sync(fn(params, x, t))
        cold = time.time() - t0
        ts = []
        for _ in range(7):
            t0 = time.time()
            sync(fn(params, x, t))
            ts.append(time.time() - t0)
        print(f"hr step {name}: {np.median(ts) * 1e3:.1f} ms "
              f"(cold {cold:.1f}s) -> 200 steps = "
              f"{np.median(ts) * 200:.1f}s")


if __name__ == "__main__":
    main()
