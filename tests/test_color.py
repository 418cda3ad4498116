"""Color pipeline: color input features, per-node color heads, MPU color
interpolation and geometry_color_loss (`loss.py:180-197` equivalent)."""

import numpy as np
import jax
import jax.numpy as jnp

from octfusion_tpu.config import (CapacityConfig, Config, DataConfig,
                                  LossConfig, SolverConfig, TrainConfig,
                                  VAEConfig)
from octfusion_tpu.data.dataset import SyntheticDataset, collate
from octfusion_tpu.models.vae_solver import VAESolver
from octfusion_tpu.ops import mpu as mpu_ops


def color_config():
    return Config(
        solver=SolverConfig(resolution=16),
        model=VAEConfig(
            depth=4, full_depth=2, depth_stop=3, depth_out=4,
            embed_dim=2, resblk_num=1, channels=(4, 8, 8, 8, 8),
            use_checkpoint=False, channel_in=7,
        ),
        capacity=CapacityConfig(finest_cap=2048, decay=1.0),
        data=DataConfig(name="synthetic", batch_size=2,
                        point_sample_num=64, points_per_shape=1024,
                        load_color=True),
        loss=LossConfig(name="color"),
        train=TrainConfig(lr=1e-3),
    )


def test_mpu_interp_constant_field():
    """Interpolating a constant per-node value returns that constant
    wherever the field is covered (partition of unity)."""
    from octfusion_tpu.octree.octree import OctreeSpec, build_octree

    rng = np.random.RandomState(0)
    v = rng.normal(size=(300, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    spec = OctreeSpec.create(4, 2, 1, finest_cap_per_sample=2048, decay=1.0)
    o = build_octree(
        jnp.asarray((0.6 * v).astype(np.float32)),
        jnp.asarray(v.astype(np.float32)), spec,
    )
    vals = {
        dd: jnp.full((spec.node_caps[dd], 3), 0.25, jnp.float32)
        for dd in range(2, 5)
    }
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, size=(32, 3)).astype(np.float32))
    pb = jnp.zeros((32,), jnp.int32)
    out = mpu_ops.mpu_interp(pos, pb, vals, o, 2, 4)
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-4)


def test_color_vae_train_step():
    cfg = color_config()
    solver = VAESolver(cfg)
    ds = SyntheticDataset(size=2, point_sample_num=64, points_per_shape=1024,
                          load_color=True)
    batch = collate([ds[0], ds[1]])
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "filename"}
    assert jb["point_colors"].shape == (2, 1024, 3)
    key = jax.random.PRNGKey(0)
    state = solver.init_state(key, jb, total_steps=10)
    step = solver.make_train_step(total_steps=10)
    state2, ld = step(state, jb, key)
    assert int(state2.step) == 1
    for d in (3, 4):
        assert np.isfinite(float(ld[f"color_loss_{d}"]))
        assert float(ld[f"color_loss_{d}"]) > 0
    assert np.isfinite(float(ld["loss"]))
    # color params actually received gradients (changed after the step)
    p0 = state.params["params"]["color_0"]["head1"]["linear"]["kernel"]
    p1 = state2.params["params"]["color_0"]["head1"]["linear"]["kernel"]
    assert float(jnp.abs(p1 - p0).max()) > 0
