"""Microbenchmarks for the hot ops (SURVEY.md §3 'hot loops ranked'):
graph conv, dual-graph build, hr denoise step, MPU grid chunk.

    python benchmarks/microbench.py [--finest_cap 32768] [--repeat 20]

Prints one line per op with warm per-call milliseconds.  Used to decide
where Pallas kernels pay off (the XLA baseline numbers are the bar).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--finest_cap", type=int, default=32768)
    p.add_argument("--repeat", type=int, default=20)
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()
    import jax.numpy as jnp
    import numpy as np

    from octfusion_tpu.config import CapacityConfig
    from octfusion_tpu.models.common import batch_to_graph_jit
    from octfusion_tpu.ops import graph_ops, mpu as mpu_ops

    cap = CapacityConfig(finest_cap=args.finest_cap)
    spec = cap.octree_spec(8, 4, 1)
    rng = np.random.RandomState(0)
    v = rng.normal(size=(1, 16384, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = jnp.asarray((0.6 * v).astype(np.float32))
    nrm = jnp.asarray(v.astype(np.float32))

    def bench(name, fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t = time.time()
        for _ in range(args.repeat):
            out = fn(*xs)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t) / args.repeat * 1000
        print(f"{name:40s} {dt:10.3f} ms")
        return out

    octree, g = bench(
        "octree+graph build (depth 8, up_to 6)",
        lambda a, b: batch_to_graph_jit(a, b, spec, 10, 6), pts, nrm,
    )
    lvl = g.level(6)
    c = args.channels
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (lvl.g_cap, c))
    w = jax.random.normal(key, (7 * c, c)) * 0.02
    conv = jax.jit(lambda x, w: graph_ops.graph_conv(x, w, lvl))
    bench(f"graph_conv [{lvl.g_cap}x{c}] (fp32)", conv, x, w)
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    bench(f"graph_conv [{lvl.g_cap}x{c}] (bf16)", conv, xb, wb)
    gn_s = jnp.ones((c,))
    gn_b = jnp.zeros((c,))
    gnorm = jax.jit(
        lambda x: graph_ops.dual_group_norm(x, lvl, gn_s, gn_b, 32)
    )
    bench(f"dual_group_norm [{lvl.g_cap}x{c}]", gnorm, x)

    # hr denoise step at real scale
    from octfusion_tpu.nn.unet_union import UNetUnion, UnionConfig

    model = UNetUnion(UnionConfig(), stage_flag="hr")
    code = jax.random.normal(key, (lvl.g_cap, 3))
    t0 = jnp.zeros((1,))
    lr_x = jnp.zeros((1, 16, 16, 16, 8))
    params = jax.jit(
        lambda k: model.init(k, lr_x, code, g, t0, method=UNetUnion.warmup)
    )(key)
    step = jax.jit(lambda p, x: model.apply(p, "hr", x, t0, g=g))
    bench("hr denoise step (mc128, with lr middle)", step, params, code)

    # MPU chunk
    reg = {
        d: jax.random.normal(key, (spec.node_caps[d], 4))
        for d in range(4, 9)
    }
    qpos = jax.random.uniform(key, (64**3, 3), minval=-0.9, maxval=0.9)
    qb = jnp.zeros((64**3,), jnp.int32)
    mpu_fn = jax.jit(
        lambda pos: mpu_ops.mpu_eval(pos, qb, reg, octree, 4, 8)[0]
    )
    bench("MPU chunk 64^3 (depth 8)", mpu_fn, qpos)


if __name__ == "__main__":
    main()
