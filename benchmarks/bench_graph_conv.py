"""Fused Pallas graph-conv vs XLA segment-sum path on the current backend.

    python benchmarks/bench_graph_conv.py [finest_cap] [n_convs] [tile_t]

Times a chain of ``n_convs`` convolutions (data dependence between them,
like a network) at the hr U-Net's level/channel combinations, plus the
plan-build cost.
"""

import sys
import time

import numpy as np


def sync(x):
    return np.asarray(x.reshape(-1)[0])


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    tile_t = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    import jax
    import jax.numpy as jnp

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()
    from octfusion_tpu.octree.dual_graph import (N_EDGE_TYPE,
                                                 build_dual_graph,
                                                 with_conv_plans)
    from octfusion_tpu.octree.octree import OctreeSpec, build_octree
    from octfusion_tpu.ops import graph_ops

    spec = OctreeSpec.create(8, 4, 1, finest_cap_per_sample=cap)
    rng = np.random.RandomState(0)
    v = rng.normal(size=(65536, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = 0.6 + 0.15 * np.sin(5 * v[:, 0]) * np.cos(4 * v[:, 1])
    o = jax.jit(build_octree, static_argnames=("spec",))(
        jnp.asarray((r[:, None] * v).astype(np.float32)),
        jnp.asarray(v.astype(np.float32)), spec,
    )
    g = jax.jit(
        build_dual_graph, static_argnames=("edge_factor", "up_to")
    )(o, 9, 6)
    print(f"devices={jax.devices()} cap={cap}")

    plans = jax.jit(with_conv_plans, static_argnames=("tile_t",))
    t0 = time.time()
    gp = plans(g, tile_t=tile_t)
    sync(gp.level(6).conv_plan.f_offs)
    print(f"plan build (all levels, T={tile_t}) compile+run: "
          f"{time.time() - t0:.2f}s")
    t0 = time.time()
    gp = plans(g, tile_t=tile_t)
    sync(gp.level(6).conv_plan.f_offs)
    print(f"plan build warm: {(time.time() - t0) * 1e3:.1f} ms")

    for d, c in ((6, 128), (5, 256), (4, 512)):
        lvl_x = g.level(d)
        lvl_p = gp.level(d)
        x0 = jnp.asarray(
            rng.normal(size=(lvl_x.g_cap, c)).astype(np.float32)
        )
        w = jnp.asarray(
            (rng.normal(size=(N_EDGE_TYPE * c, c)) * 0.05).astype(np.float32)
        )

        def chain(x, lvl):
            for _ in range(n_convs):
                x = graph_ops.graph_conv(x, w, lvl)
                x = x * (1.0 / max(1.0, float(np.sqrt(c))))
            return x

        for name, lvl in (("xla", lvl_x), ("pallas", lvl_p)):
            f = jax.jit(lambda x, lvl=lvl: chain(x, lvl))
            t0 = time.time()
            sync(f(x0))
            cold = time.time() - t0
            ts = []
            for _ in range(5):
                t0 = time.time()
                sync(f(x0))
                ts.append(time.time() - t0)
            per = np.median(ts) / n_convs * 1e3
            print(f"d={d} C={c} {name:7s}: {per:.3f} ms/conv "
                  f"(cold {cold:.1f}s, E={int(np.asarray(lvl.n_edges))}, "
                  f"G={lvl.g_cap})")


if __name__ == "__main__":
    main()
