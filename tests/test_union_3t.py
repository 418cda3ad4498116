"""Three-stage solver integration test (tiny synthetic scale)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octfusion_tpu.config import (
    CapacityConfig, Config, DataConfig, DiffusionConfig, SolverConfig,
    TrainConfig, VAEConfig,
)
from octfusion_tpu.data.dataset import SyntheticDataset, collate
from octfusion_tpu.models.union_3t_solver import Union3TSolver
from octfusion_tpu.models.vae_solver import VAESolver


def tiny_3t_config():
    return Config(
        solver=SolverConfig(resolution=24),
        model=VAEConfig(
            depth=5, full_depth=2, depth_stop=4, depth_out=5,
            embed_dim=2, resblk_num=1, channels=(4, 8, 8, 8, 8, 8),
            use_checkpoint=False,
        ),
        capacity=CapacityConfig(finest_cap=4096, decay=1.0),
        data=DataConfig(name="synthetic", batch_size=2,
                        point_sample_num=128, points_per_shape=2048),
        diffusion=DiffusionConfig(
            ddim_steps=4,
            unet_type=("lr", "hr", "feature"),
            df_type=("x0", "x0", "x0"),
            input_depth=(2, 3, 4),
            input_channels=(8, 8, 2),
            out_channels=(8, 8, 2),
            model_channels=(8, 16, 16),
            num_res_blocks=((1, 1), (1, 0), (1, 0)),
            channel_mult=((1, 2), (1, 1), (1, 1)),
            attention_resolutions=(2,),
            num_classes=None,
        ),
        train=TrainConfig(lr=1e-3),
    )


@pytest.fixture(scope="module")
def batch():
    ds = SyntheticDataset(size=2, point_sample_num=128, points_per_shape=2048)
    b = collate([ds[0], ds[1]])
    return {k: jnp.asarray(v) for k, v in b.items() if k != "filename"}


def test_union_3t_stages_and_cascade(batch, tmp_path):
    cfg = tiny_3t_config()
    key = jax.random.PRNGKey(0)
    vae_state = VAESolver(cfg).init_state(key, batch, total_steps=10)

    # hr stage (split_large diffusion)
    hr_solver = Union3TSolver(cfg, stage_flag="hr")
    state = hr_solver.init_state(key, batch)
    step = hr_solver.make_train_step()
    state, ld = step(state, vae_state.params, batch, key)
    assert np.isfinite(float(ld["loss"]))

    # feature stage + full 3-hop cascade
    solver = Union3TSolver(cfg, stage_flag="feature")
    fstate = solver.init_state(key, batch)
    fstep = solver.make_train_step()
    fstate, fld = fstep(fstate, vae_state.params, batch, key)
    assert np.isfinite(float(fld["loss"]))
    # frozen subtrees stay put
    fstate2, _ = fstep(fstate, vae_state.params, batch, key)
    for sub in ("unet_lr", "unet_hr"):
        a = jax.tree_util.tree_leaves(fstate.params["params"][sub])
        b2 = jax.tree_util.tree_leaves(fstate2.params["params"][sub])
        for x, y in zip(a, b2):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    out = solver.sample(
        fstate.ema_params, vae_state.params, key, batch_size=1, steps=3,
        resolution=16, save_paths=[str(tmp_path / "s.obj")],
    )
    assert out["sdfs"].shape == (1, 16, 16, 16)
    assert np.isfinite(out["sdfs"]).all()
    assert out["split_large"].shape[1] == 8
