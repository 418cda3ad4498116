"""Conditional (class-labelled) workload tests — the cascade-level
label-plumbing coverage VERDICT r3 asked for.

Reference conditional workload: 5-class label embedding added to the time
embedding in both U-Nets (`/root/reference/models/networks/
diffusion_networks/graph_unet_lr.py:113-114`;
`configs/octfusion_snet_cond.yaml:17-27`).  The synthetic stand-in makes
labels *geometrically meaningful* via ``class_families=True``
(sphere/box/torus/dumbbell/cross, `data/dataset.py`), so class consistency
of samples is measurable by nearest-reference-class purity
(`tools/class_purity.py`)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from octfusion_tpu.data.dataset import SyntheticDataset, collate
from octfusion_tpu.metrics.distances import pairwise_cd_emd
from octfusion_tpu.models.union_solver import UnionSolver

from test_solvers import tiny_config


def _norm(v):
    centre = (v.min(0) + v.max(0)) / 2
    scale = (v.max(0) - v.min(0)).max()
    return (v - centre) / max(scale, 1e-9)


def test_family_separability():
    """Held-out family shapes must be Chamfer-nearest to their own class —
    the property tools/class_purity.py relies on to score conditional
    generation."""
    ds = SyntheticDataset(size=50, point_sample_num=64,
                          points_per_shape=512, class_families=True)
    rng = np.random.RandomState(0)

    def cloud(idx):
        pts = ds[idx]["points"]
        return _norm(pts[rng.randint(0, len(pts), 128)])

    # refs: indices 0..24 (5 per class), queries: 25..49 (5 per class)
    refs = np.stack([cloud(i) for i in range(25)]).astype(np.float32)
    queries = np.stack([cloud(i) for i in range(25, 50)]).astype(np.float32)
    ref_lab = np.arange(25) % 5
    q_lab = np.arange(25, 50) % 5
    cd, _ = pairwise_cd_emd(queries, refs, emd=False, batch=25, row_block=5)
    pred = ref_lab[np.argmin(cd, axis=1)]
    purity = float((pred == q_lab).mean())
    assert purity >= 0.9, (purity, pred.tolist(), q_lab.tolist())


def _cond_config():
    # truncated_time=0 disables the lr sampler's sign snapping
    # (`octfusion_model_union.py:324-325`): snapping quantises the state to
    # {-1, 1}, which at near-init weights erases the (small) label-driven
    # trajectory differences this test must observe.
    cfg = tiny_config()
    return dataclasses.replace(
        cfg, diffusion=dataclasses.replace(
            cfg.diffusion, num_classes=5, truncated_time=0.0)
    )


def test_conditional_cascade_label_plumbing():
    """After a few labelled train steps, the sampling cascade must depend on
    the conditioning label (identical PRNG key, different label -> different
    split grid) and be deterministic per label — catches any regression that
    silently drops the label between CLI, solver, sampler and U-Net."""
    cfg = _cond_config()
    ds = SyntheticDataset(size=4, point_sample_num=256, points_per_shape=2048,
                          class_families=True)
    b = collate([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != "filename"}
    assert int(batch["label"][0]) != int(batch["label"][1])

    solver = UnionSolver(cfg, stage_flag="lr")
    key = jax.random.PRNGKey(7)
    state = solver.init_state(key, batch)
    step = solver.make_train_step()
    for _ in range(3):
        key, k = jax.random.split(key)
        state, ld = step(state, None, batch, k)
        assert np.isfinite(float(ld["loss"]))

    kk = jax.random.PRNGKey(11)
    lab = lambda c: jnp.full((1,), c, jnp.int32)
    # trained params (not EMA ~= init, whose zero-init out conv makes the
    # x0 prediction label-independent)
    s0 = solver.sample_lr(state.params, kk, batch_size=1,
                          label=lab(0), steps=4)
    s0b = solver.sample_lr(state.params, kk, batch_size=1,
                           label=lab(0), steps=4)
    s1 = solver.sample_lr(state.params, kk, batch_size=1,
                          label=lab(1), steps=4)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s0b))
    assert float(jnp.abs(s0 - s1).max()) > 0.0


def test_conditional_full_cascade_label_plumbing():
    """The label must survive the FULL generation cascade (lr sample ->
    split2octree -> dual graph -> hr sample -> growing VAE decode), not
    just the lr stage: identical PRNG key with different labels must give
    different decoded fields, and the cascade must be deterministic per
    label.  Guards the path `tools/class_purity.py` scores on hardware
    (VERDICT r4 ask #3) against silent label drops between the stages.
    Reference cascade: `octfusion_model_union.py:300-352` with the label
    embedding of `graph_unet_lr.py:113-114`."""
    from octfusion_tpu.models.vae_solver import VAESolver

    cfg = _cond_config()
    ds = SyntheticDataset(size=4, point_sample_num=256, points_per_shape=2048,
                          class_families=True)
    b = collate([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != "filename"}
    b1 = {k: v[:1] for k, v in batch.items()}

    key = jax.random.PRNGKey(3)
    solver = UnionSolver(cfg, stage_flag="hr")
    vs = VAESolver(cfg)
    state = solver.init_state(key, b1)
    vstate = vs.init_state(key, b1, 10)
    step = solver.make_train_step()
    for _ in range(3):
        key, k = jax.random.split(key)
        state, ld = step(state, vstate.params, batch, k)
        assert np.isfinite(float(ld["loss"]))

    kk = jax.random.PRNGKey(17)
    lab = lambda c: jnp.full((1,), c, jnp.int32)
    d_out = cfg.model.depth_out
    out0 = solver.dp_cascade(state.params, vstate.params, kk,
                             label=lab(0), steps=3)
    out0b = solver.dp_cascade(state.params, vstate.params, kk,
                              label=lab(0), steps=3)
    out1 = solver.dp_cascade(state.params, vstate.params, kk,
                             label=lab(1), steps=3)
    # reg_voxs is {target_depth: {depth: planes}} — compare the finest level
    r0 = np.asarray(out0["reg_voxs"][d_out][d_out])
    r0b = np.asarray(out0b["reg_voxs"][d_out][d_out])
    r1 = np.asarray(out1["reg_voxs"][d_out][d_out])
    np.testing.assert_array_equal(r0, r0b)
    assert np.isfinite(r0).all() and np.isfinite(r1).all()
    assert np.abs(r0 - r1).max() > 0.0
