"""Overflow-contract consumers: loader-side capacity rejection and
solver-side overflow reporting (`octree/octree.py:113-116`)."""

import numpy as np
import jax
import jax.numpy as jnp

from octfusion_tpu.config import (CapacityConfig, Config, DataConfig,
                                  DiffusionConfig, SolverConfig, TrainConfig,
                                  VAEConfig)
from octfusion_tpu.data.dataset import (CapacityFilteredDataset,
                                        SyntheticDataset, collate,
                                        fits_capacity, octree_node_counts)
from octfusion_tpu.models.vae_solver import VAESolver


def overflow_config(finest_cap):
    return Config(
        solver=SolverConfig(resolution=16),
        model=VAEConfig(
            depth=4, full_depth=2, depth_stop=3, depth_out=4,
            embed_dim=2, resblk_num=1, channels=(4, 8, 8, 8, 8),
            use_checkpoint=False,
        ),
        capacity=CapacityConfig(finest_cap=finest_cap, decay=1.0),
        data=DataConfig(name="synthetic", batch_size=1,
                        point_sample_num=64, points_per_shape=512),
        diffusion=DiffusionConfig(
            ddim_steps=2, input_depth=(2, 3), input_channels=(8, 2),
            out_channels=(8, 2), model_channels=(8, 8),
            channel_mult=((1,), (1,)), num_res_blocks=((1,), (1,)),
            attention_resolutions=(), num_classes=None,
        ),
        train=TrainConfig(lr=1e-3),
    )


def dense_sample(n=512):
    """A point cloud spread over the whole cube — occupies ~every node."""
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.99, 0.99, size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    return pts, nrm


def test_octree_node_counts_match_device_build():
    cfg = overflow_config(finest_cap=4096)
    spec = cfg.capacity.octree_spec(4, 2, 1)
    ds = SyntheticDataset(size=2, point_sample_num=32, points_per_shape=512)
    s = ds[0]
    counts = octree_node_counts(s["points"], spec.depth, spec.full_depth)
    from octfusion_tpu.octree.octree import build_octree

    o = build_octree(
        jnp.asarray(s["points"]), jnp.asarray(s["normals"]), spec
    )
    for d in range(spec.full_depth + 1, spec.depth + 1):
        assert counts[d] == int(o.nnum[d]), d


def test_fits_capacity_and_filter():
    cfg = overflow_config(finest_cap=64)  # deliberately too small
    spec = cfg.capacity.octree_spec(4, 2, 1)
    pts, _ = dense_sample()
    assert not fits_capacity(pts, spec)

    class TinyDs:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            p, n = dense_sample()
            if i == 1:  # only index 1 fits: a tight cluster
                p = (p * 0.02).astype(np.float32)
            return {"filename": f"s{i}", "points": p, "normals": n,
                    "label": 0}

    filt = CapacityFilteredDataset(TinyDs(), spec)
    out = filt[0]  # 0 overflows -> filter walks forward to 1
    assert out["filename"] == "s1"


def test_vae_solver_reports_overflow():
    cfg = overflow_config(finest_cap=64)  # too small for a dense cloud
    solver = VAESolver(cfg)
    pts, nrm = dense_sample()
    batch = {
        "points": jnp.asarray(pts[None]),
        "normals": jnp.asarray(nrm[None]),
        "pos": jnp.asarray(pts[None, :64]),
        "sdf": jnp.zeros((1, 64), jnp.float32),
        "grad": jnp.asarray(nrm[None, :64]),
    }
    key = jax.random.PRNGKey(0)
    state = solver.init_state(key, batch, total_steps=10)
    _, ld = jax.jit(solver.loss_fn)(state.params, batch, key)
    assert float(ld["overflow"]) > 0

    # and a comfortably-capacitated build reports no overflow
    cfg2 = overflow_config(finest_cap=4096)
    solver2 = VAESolver(cfg2)
    state2 = solver2.init_state(key, batch, total_steps=10)
    _, ld2 = jax.jit(solver2.loss_fn)(state2.params, batch, key)
    assert float(ld2["overflow"]) == 0
