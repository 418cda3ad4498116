"""Growing-decode (6->8) ablation at full capacity: full decode vs
topology-only (split/grow/extend, no NN) vs NN-only (fixed topology).

    python benchmarks/bench_decode.py [finest_cap]
"""

import sys
import time

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
    from octfusion_tpu.config import CapacityConfig, Config, SolverConfig
    from octfusion_tpu.data.dataset import SyntheticDataset, collate
    from octfusion_tpu.models.union_solver import UnionSolver
    from octfusion_tpu.models.vae_solver import VAESolver
    from octfusion_tpu.nn.vae import GraphVAE
    from octfusion_tpu.octree.dual_graph import extend_dual_graph

    cfg = Config(solver=SolverConfig(resolution=256),
                 capacity=CapacityConfig(finest_cap=cap))
    m = cfg.model
    key = jax.random.PRNGKey(0)
    ds = SyntheticDataset(size=1, point_sample_num=512, points_per_shape=16384)
    jb = {k: jnp.asarray(v) for k, v in collate([ds[0]]).items()
          if k != "filename"}
    vae_solver = VAESolver(cfg)
    vstate = vae_solver.init_state(key, jb, total_steps=10)
    solver = UnionSolver(cfg, stage_flag="hr")
    state = solver.init_state(key, jb)

    out = solver.sample(state.ema_params, vstate.params,
                        jax.random.PRNGKey(1), batch_size=1, steps=8,
                        compute_sdf=False)
    # rebuild g_small the way sample() does
    from octfusion_tpu.octree import split_codec
    from octfusion_tpu.octree.dual_graph import (build_dual_graph,
                                                 with_conv_plans)

    spec = solver.spec1

    def grow(split):
        o = split_codec.split2octree_small(split, spec)
        g = build_dual_graph(o, solver.edge_factor, up_to=solver.small_depth)
        return o, with_conv_plans(g)

    _, g_small = jax.jit(grow)(out["split_small"])
    code = out["code"]

    def timeit(name, fn, *args):
        r = fn(*args)
        sync(r)
        ts = []
        for _ in range(4):
            t0 = time.time()
            r = fn(*args)
            sync(r)
            ts.append(time.time() - t0)
        print(f"{name:28s}: {np.median(ts) * 1e3:7.1f} ms")
        return r

    # 1) full growing decode
    dec = jax.jit(lambda vp, c, g: solver.vae.apply(
        vp, c, g, method=GraphVAE.decode_grow))
    full = timeit("decode_grow (full)", dec, vstate.params, code, g_small)

    # 2) topology only: random splits at 6 and 7, no NN
    def topo(g):
        octree = g.octree
        for d in (6, 7):
            lvl_cap = octree.spec.node_caps[d]
            label = (jnp.arange(lvl_cap, dtype=jnp.int32) % 2)
            octree = octree.octree_split(label, d)
            octree = octree.octree_grow(d + 1)
            g = extend_dual_graph(g.replace(octree=octree), octree)
        return g.level(8).edge_row

    timeit("topology (split/grow/extend)", jax.jit(topo), g_small)

    # 3) fixed-topology decode on the grown graph (NN only)
    g_full = full["graph_out"]
    dec_fix = jax.jit(lambda vp, c, g: solver.vae.apply(
        vp, c, g, method=GraphVAE.decode))
    timeit("decode (fixed topology NN)", dec_fix, vstate.params, code, g_full)


if __name__ == "__main__":
    main()
