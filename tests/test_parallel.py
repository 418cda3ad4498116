"""Multi-device (8 virtual CPU devices) DP/SP train-step tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octfusion_tpu.data.dataset import SyntheticDataset, collate
from octfusion_tpu.models.union_solver import UnionSolver
from octfusion_tpu.models.vae_solver import VAESolver
from octfusion_tpu.parallel.mesh import make_mesh
from octfusion_tpu.parallel import train_step as pts

from test_solvers import tiny_config


def make_batch(n, m=256, p=2048):
    ds = SyntheticDataset(size=n, point_sample_num=m, points_per_shape=p)
    return collate([ds[i] for i in range(n)])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_vae_dp_sp_step_matches_single_device():
    """The DP+SP sharded step must produce the same loss and updated params
    as the equivalent single-device computation: averaging per-(data, model)
    shard losses/grads computed with the same folded keys and batch slices."""
    cfg = tiny_config()
    solver = VAESolver(cfg)
    key = jax.random.PRNGKey(0)
    n_data, n_model, m = 4, 2, 256
    batch = make_batch(n_data, m=m)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "filename"}
    state = solver.init_state(key, {k: v[:1] for k, v in jb.items()}, 100)

    mesh = make_mesh(data=n_data, model=n_model)
    step = pts.make_vae_dp_train_step(solver, mesh, total_steps=100)
    sb = pts.shard_batch(batch, mesh, vae=True)
    state2, ld = step(state, sb, key)
    assert int(state2.step) == 1

    # single-device reference: replay every shard's local computation with
    # the same folded key and batch slice, average losses and grads
    import optax

    msz = m // n_model
    losses, grads_acc = [], None
    grad_fn = jax.jit(jax.value_and_grad(solver.loss_fn, has_aux=True))
    for di in range(n_data):
        for mi in range(n_model):
            lb = {
                "points": jb["points"][di:di + 1],
                "normals": jb["normals"][di:di + 1],
                "label": jb["label"][di:di + 1],
                "pos": jb["pos"][di:di + 1, mi * msz:(mi + 1) * msz],
                "sdf": jb["sdf"][di:di + 1, mi * msz:(mi + 1) * msz],
                "grad": jb["grad"][di:di + 1, mi * msz:(mi + 1) * msz],
            }
            fk = jax.random.fold_in(jax.random.fold_in(key, di), mi)
            (loss, _), grads = grad_fn(state.params, lb, fk)
            losses.append(loss)
            grads_acc = grads if grads_acc is None else jax.tree_util.tree_map(
                jnp.add, grads_acc, grads
            )
    n_shards = n_data * n_model
    ref_loss = float(np.mean([float(x) for x in losses]))
    mean_grads = jax.tree_util.tree_map(lambda g: g / n_shards, grads_acc)
    opt = solver.make_optimizer(100)
    updates, _ = opt.update(mean_grads, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)

    assert np.isfinite(ref_loss)
    np.testing.assert_allclose(float(ld["loss"]), ref_loss, rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state2.params),
        jax.tree_util.tree_leaves(ref_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_union_lr_dp_step():
    cfg = tiny_config()
    solver = UnionSolver(cfg, stage_flag="lr")
    key = jax.random.PRNGKey(1)
    batch = make_batch(8, m=64, p=1024)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "filename"}
    state = solver.init_state(key, {k: v[:1] for k, v in jb.items()})

    mesh = make_mesh(data=8, model=1)
    step = pts.make_union_dp_train_step(solver, mesh)
    sb = pts.shard_batch(batch, mesh, vae=False)
    state2, ld = step(state, None, sb, key)
    assert np.isfinite(float(ld["loss"]))
    state3, ld2 = step(state2, None, sb, key)
    assert np.isfinite(float(ld2["loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_sample_generates_per_device_shapes():
    """Each device of the data axis generates its own shape (the v5e-8
    throughput path): distinct keys must give distinct SDF grids."""
    cfg = tiny_config()
    solver = UnionSolver(cfg, stage_flag="hr")
    vs = VAESolver(cfg)
    key = jax.random.PRNGKey(5)
    batch = make_batch(2)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "filename"}
    state = solver.init_state(key, {k: v[:1] for k, v in jb.items()})
    vstate = vs.init_state(key, {k: v[:1] for k, v in jb.items()}, 10)

    mesh = make_mesh(data=8, model=1)
    sample_fn = pts.make_dp_sample(solver, mesh, steps=3, resolution=16)
    keys = jax.random.split(key, 8)
    ids, vals, counts, grids = sample_fn(
        state.ema_params, vstate.params, keys
    )
    assert grids.shape == (8, 16, 16, 16)
    assert ids.shape == (8, 8 * 16 * 16) and vals.shape[:2] == ids.shape
    g = np.asarray(grids, np.float32)
    assert np.isfinite(g).all()
    # different devices got different noise -> different shapes
    assert np.abs(g[0] - g[1]).max() > 0
    # compact transfer consistent with the dense grid per device (ids are
    # clamped to the cell cap; counts above it signal the dense fallback)
    counts_h = np.asarray(counts)
    ids_h = np.asarray(ids)
    cap = ids_h.shape[1]
    assert (np.minimum(counts_h, cap) == (ids_h >= 0).sum(1)).all()
    # compact=False keeps the dense-grid contract
    fn2 = pts.make_dp_sample(solver, mesh, steps=3, resolution=16,
                             compact=False)
    g2 = fn2(state.ema_params, vstate.params, keys)
    np.testing.assert_allclose(np.asarray(g2, np.float32), g, atol=2e-3)
