"""Stage-by-stage timing of the full generation cascade at full capacity
(explicit 1-element syncs between stages; run on the real TPU)."""

import time

import numpy as np


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def main():
    import jax
    import jax.numpy as jnp

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()
    from octfusion_tpu.config import CapacityConfig, Config, SolverConfig
    from octfusion_tpu.data.dataset import SyntheticDataset, collate
    from octfusion_tpu.models.union_solver import UnionSolver
    from octfusion_tpu.models.vae_solver import VAESolver
    from octfusion_tpu.nn.vae import GraphVAE
    from octfusion_tpu.utils import mesh as mesh_utils
    from octfusion_tpu.utils import sdf as sdf_utils

    cfg = Config(solver=SolverConfig(resolution=256),
                 capacity=CapacityConfig(finest_cap=131072))
    m = cfg.model
    key = jax.random.PRNGKey(0)
    ds = SyntheticDataset(size=1, point_sample_num=512, points_per_shape=16384)
    jb = {k: jnp.asarray(v) for k, v in collate([ds[0]]).items()
          if k != "filename"}
    vae_solver = VAESolver(cfg)
    vstate = vae_solver.init_state(key, jb, total_steps=10)
    solver = UnionSolver(cfg, stage_flag="hr")
    state = solver.init_state(key, jb)

    def stage(name, fn, *args, n=3, **kw):
        out = fn(*args, **kw)
        sync(out)
        ts = []
        for _ in range(n):
            t0 = time.time()
            out = fn(*args, **kw)
            sync(out)
            ts.append(time.time() - t0)
        print(f"{name:24s}: {np.median(ts):7.3f} s")
        return out

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    split = stage(
        "lr sampling (200)", lambda: solver._jit(
            "sample_lr", solver.sample_lr,
            static_argnames=("batch_size", "steps"),
        )(state.ema_params, k1, batch_size=1, steps=200)
    )
    spec = solver.spec1

    def grow(split):
        from octfusion_tpu.octree import split_codec
        from octfusion_tpu.octree.dual_graph import (build_dual_graph,
                                                     with_conv_plans)

        o = split_codec.split2octree_small(split, spec)
        g = build_dual_graph(o, solver.edge_factor, up_to=solver.small_depth)
        return o, with_conv_plans(g)

    grow_j = jax.jit(grow)
    _, g_small = stage("octree+graph+plans", grow_j, split)
    code = stage(
        "hr sampling (200)", lambda: solver._jit(
            "sample_hr", solver.sample_hr,
            static_argnames=("batch_size", "steps"),
        )(state.ema_params, k2, g_small, batch_size=1, steps=200)
    )
    dec = jax.jit(lambda vp, c, g: solver.vae.apply(
        vp, c, g, method=GraphVAE.decode_grow))
    out = stage("growing decode 6->8", dec, vstate.params, code, g_small)

    # analytic realistic field (bench.py's)
    def areg(octree):
        o = {}
        for dd in range(m.full_depth, m.depth_out + 1):
            x, y, z, _ = octree.xyzb(dd)
            s = 2**dd
            c = (jnp.stack([x, y, z], -1).astype(jnp.float32) + 0.5) / s
            c = c * 2 - 1
            r = jnp.linalg.norm(c, axis=-1, keepdims=True)
            n = c / jnp.maximum(r, 1e-9)
            rad = 0.55 + 0.08 * jnp.sin(5 * c[:, :1]) * jnp.cos(4 * c[:, 1:2])
            o[dd] = jnp.where(octree.node_mask(dd)[:, None],
                              jnp.concatenate([n, r - rad], -1), 0.0)
        return o

    reg = jax.jit(areg)(out["octree_out"])
    sync(reg[8])

    oo = out["octree_out"]
    cap = 8 * 256 * 256
    dev = stage(
        "sdf eval+extract (dev)",
        lambda: sdf_utils._sdf_compact_device(
            reg, oo, m.full_depth, m.depth_out, 256,
            jnp.float32(-0.9), jnp.float32(0.9), cap, 0.0,
        ),
    )
    counts = np.asarray(dev[2])
    ids, vals = np.asarray(dev[0]), np.asarray(dev[1]).astype(np.float32)
    print(f"{'active cells':24s}: counts={counts} "
          f"valid_ids={(ids[0] >= 0).sum()} cap={cap}")
    ts = []
    for _ in range(3):
        t0 = time.time()
        v, f = mesh_utils.marching_from_cells(ids[0], vals[0], 256, 0.0)
        ts.append(time.time() - t0)
    print(f"{'cell marching (host)':24s}: {np.median(ts):7.3f} s "
          f"({len(v)} verts, {len(f)} faces)")
    t0 = time.time()
    meshes = sdf_utils.extract_meshes_compact(
        reg, oo, m.full_depth, m.depth_out, 1, size=256,
        bbmin=-0.9, bbmax=0.9,
    )
    print(f"{'extract_meshes_compact':24s}: {time.time() - t0:7.3f} s "
          f"({len(meshes[0][0])} verts)")


if __name__ == "__main__":
    main()
