"""Attribute the hr denoise step's time by ablating op families.

    python benchmarks/bench_hr_ablate.py [finest_cap]

Monkeypatches graph_ops primitives with cheap stand-ins (keeping shapes) to
measure how much of the step each family costs.  Numbers are indicative —
XLA refuses nothing, so removing one family can shift fusion — but they
rank the levers.
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
    from octfusion_tpu.ops import graph_ops

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
    gp = jax.jit(with_conv_plans)(g)
    lvl = g.level(6)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (lvl.g_cap, 3), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    s = 16
    lr_x = jnp.zeros((1, s, s, s, 8), jnp.float32)
    params = jax.jit(
        lambda k: model.init(k, lr_x, x, g, t, method=UNetUnion.warmup)
    )(key)

    orig_conv = graph_ops.graph_conv
    orig_norm = graph_ops.dual_group_norm

    def fake_conv(xx, w, lv, n_node_type=0):
        # keep the GEMM, drop the gather/scatter (or kernel)
        c = xx.shape[1] + (n_node_type if n_node_type > 1 else 0)
        wv = w.reshape(7, c, -1)[6]
        return jnp.dot(xx[:, : wv.shape[0]], wv[: xx.shape[1]])

    def fake_norm(xx, lv, scale, bias, group, eps=1e-5):
        return xx * scale[None, :] + bias[None, :]

    def run(name, graph, conv=None, norm=None):
        graph_ops.graph_conv = conv or orig_conv
        graph_ops.dual_group_norm = norm or orig_norm
        fn = jax.jit(
            lambda p, xx, tt: model.apply(p, "hr", xx, tt, g=graph)
        )
        sync(fn(params, x, t))
        ts = []
        for _ in range(5):
            t0 = time.time()
            sync(fn(params, x, t))
            ts.append(time.time() - t0)
        print(f"{name:28s}: {np.median(ts) * 1e3:.1f} ms")
        graph_ops.graph_conv = orig_conv
        graph_ops.dual_group_norm = orig_norm

    run("full (plans)", gp)
    run("full (xla conv)", g)
    run("conv -> 1x1 GEMM", g, conv=fake_conv)
    run("norm -> affine", gp, norm=fake_norm)
    run("conv+norm stubbed", g, conv=fake_conv, norm=fake_norm)


if __name__ == "__main__":
    main()
