"""Integration tests: solvers on synthetic data at tiny scale."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octfusion_tpu.config import (
    CapacityConfig, Config, DataConfig, DiffusionConfig, SolverConfig,
    TrainConfig, VAEConfig,
)
from octfusion_tpu.data.dataset import SyntheticDataset, collate
from octfusion_tpu.models.union_solver import UnionSolver
from octfusion_tpu.models.vae_solver import VAESolver


def tiny_config():
    return Config(
        solver=SolverConfig(resolution=32),
        model=VAEConfig(
            depth=4, full_depth=2, depth_stop=3, depth_out=4,
            embed_dim=2, resblk_num=1, channels=(4, 8, 8, 8, 8),
            use_checkpoint=False,
        ),
        capacity=CapacityConfig(finest_cap=2048, decay=1.0, edge_factor=10),
        data=DataConfig(name="synthetic", batch_size=2,
                        point_sample_num=256, points_per_shape=2048),
        diffusion=DiffusionConfig(
            ddim_steps=6,
            input_depth=(2, 3),
            input_channels=(8, 2),
            out_channels=(8, 2),
            model_channels=(8, 16),
            channel_mult=((1, 2), (1, 1)),
            num_res_blocks=((1, 1), (1, 0)),
            attention_resolutions=(2,),
            num_classes=None,
        ),
        train=TrainConfig(lr=1e-3),
    )


@pytest.fixture(scope="module")
def batch():
    ds = SyntheticDataset(size=4, point_sample_num=256, points_per_shape=2048)
    b = collate([ds[0], ds[1]])
    return {k: jnp.asarray(v) for k, v in b.items() if k != "filename"}


def test_vae_train_decreases_loss(batch):
    cfg = tiny_config()
    solver = VAESolver(cfg)
    key = jax.random.PRNGKey(0)
    state = solver.init_state(key, batch, total_steps=100)
    step = solver.make_train_step(total_steps=100)
    losses = []
    for i in range(8):
        key, k = jax.random.split(key)
        state, ld = step(state, batch, k)
        losses.append(float(ld["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_vae_reconstruct(batch, tmp_path):
    cfg = tiny_config()
    solver = VAESolver(cfg)
    key = jax.random.PRNGKey(1)
    state = solver.init_state(key, batch, total_steps=10)
    paths = [str(tmp_path / f"{i}.obj") for i in range(2)]
    sdfs, out = solver.reconstruct(
        state.params, batch, key, resolution=24, save_paths=paths
    )
    assert sdfs.shape == (2, 24, 24, 24)
    assert np.isfinite(sdfs).all()


def test_union_lr_stage(batch):
    cfg = tiny_config()
    solver = UnionSolver(cfg, stage_flag="lr")
    key = jax.random.PRNGKey(2)
    state = solver.init_state(key, batch)
    step = solver.make_train_step()
    for i in range(3):
        key, k = jax.random.split(key)
        state, ld = step(state, None, batch, k)
        assert np.isfinite(float(ld["loss"]))
    out = solver.sample(state.ema_params, None, key, batch_size=1, steps=4)
    assert out["split_small"].shape == (1, 4, 4, 4, 8)


def test_union_hr_stage_and_cascade(batch, tmp_path):
    cfg = tiny_config()
    vae_solver = VAESolver(cfg)
    key = jax.random.PRNGKey(3)
    vae_state = vae_solver.init_state(key, batch, total_steps=10)

    solver = UnionSolver(cfg, stage_flag="hr")
    state = solver.init_state(key, batch)
    step = solver.make_train_step()
    losses = []
    for i in range(3):
        key, k = jax.random.split(key)
        state, ld = step(state, vae_state.params, batch, k)
        losses.append(float(ld["loss"]))
    assert all(np.isfinite(losses))

    # frozen lr subtree must not move
    lr0 = state.params["params"]["unet_lr"]
    state2, _ = step(state, vae_state.params, batch, key)
    lr1 = state2.params["params"]["unet_lr"]
    for a, b in zip(jax.tree_util.tree_leaves(lr0), jax.tree_util.tree_leaves(lr1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trained hr subtree must move
    hr0 = jax.tree_util.tree_leaves(state.params["params"]["unet_hr"])
    hr1 = jax.tree_util.tree_leaves(state2.params["params"]["unet_hr"])
    assert any(
        float(jnp.abs(a - b).max()) > 0 for a, b in zip(hr0, hr1)
    )

    paths = [str(tmp_path / "sample0.obj")]
    out = solver.sample(
        state.ema_params, vae_state.params, key, batch_size=1, steps=4,
        resolution=24, save_paths=paths,
    )
    assert out["sdfs"].shape == (1, 24, 24, 24)
    assert np.isfinite(out["sdfs"]).all()


def test_union_cascade_batched(batch, tmp_path):
    """Cross-shape batched cascade (bench.py BENCH_BATCH / throughput
    mode): one program carries B independent samples through lr -> growth
    -> hr -> decode -> SDF, with per-sample capacities scaled by
    ``OctreeSpec.with_batch_size``."""
    cfg = tiny_config()
    vae_solver = VAESolver(cfg)
    key = jax.random.PRNGKey(4)
    vae_state = vae_solver.init_state(key, batch, total_steps=10)
    solver = UnionSolver(cfg, stage_flag="hr")
    state = solver.init_state(key, batch)
    paths = [str(tmp_path / f"s{i}.obj") for i in range(2)]
    out = solver.sample(
        state.ema_params, vae_state.params, key, batch_size=2, steps=4,
        resolution=24, save_paths=paths,
    )
    assert out["sdfs"].shape == (2, 24, 24, 24)
    assert np.isfinite(out["sdfs"]).all()
    assert out["split_small"].shape[0] == 2
    # batch elements must consume distinct noise streams
    assert float(jnp.abs(out["sdfs"][0] - out["sdfs"][1]).max()) > 0


def test_warm_compile_matches_sample(batch, tmp_path):
    """warm_compile must pre-build exactly the programs sample() uses (same
    _jit entries, shapes from eval_shape) so a subsequent sample() is
    warm — and must not change its results."""
    cfg = tiny_config()
    vae_solver = VAESolver(cfg)
    key = jax.random.PRNGKey(5)
    vae_state = vae_solver.init_state(key, batch, total_steps=10)
    solver = UnionSolver(cfg, stage_flag="hr")
    state = solver.init_state(key, batch)

    solver.warm_compile(state.ema_params, vae_state.params, batch_size=1,
                        steps=4)
    cached = set(solver._jit_cache)
    assert {"sample_lr", "grow_1", "sample_hr", "decode"} <= cached

    out = solver.sample(state.ema_params, vae_state.params, key,
                        batch_size=1, steps=4, compute_sdf=False)
    # sample() must not have had to create any new stage jits
    assert set(solver._jit_cache) == cached
    assert np.isfinite(np.asarray(out["code"])).all()

    fresh = UnionSolver(cfg, stage_flag="hr")
    ref = fresh.sample(state.ema_params, vae_state.params, key,
                       batch_size=1, steps=4, compute_sdf=False)
    np.testing.assert_array_equal(
        np.asarray(out["split_small"]), np.asarray(ref["split_small"]))
    np.testing.assert_allclose(
        np.asarray(out["code"]), np.asarray(ref["code"]), atol=0, rtol=0)
