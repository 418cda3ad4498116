"""Remat-policy plumbing: every policy computes the SAME loss and grads.

Rematerialisation only changes what the backward pass recomputes vs
saves (`nn/modules.py::remat_transform`); the math must be bit-identical
on CPU.  Guards the "conv" selective policy (save GraphConv outputs,
tagged via ``checkpoint_name``) introduced to cut the measured 77%
backward share of the full-cap VAE train step
(`results/vae_step_profile.json`).  Reference behaviour being preserved:
wholesale block remat, ckpt_conv_wrapper (`modules.py:593-641`).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octfusion_tpu.models.vae_solver import VAESolver

from tests.test_solvers import tiny_config, batch  # noqa: F401


def _loss_and_grads(cfg, batch):
    solver = VAESolver(cfg)
    key = jax.random.PRNGKey(0)
    state = solver.init_state(key, batch, total_steps=100)
    loss_fn = lambda p: solver.loss_fn(p, batch, jax.random.PRNGKey(7))[0]
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(state.params)
    return float(loss), grads


@pytest.mark.parametrize("policy", ["full", "conv", "dots", "none"])
def test_policy_matches_no_remat(batch, policy):  # noqa: F811
    base = tiny_config()  # use_checkpoint=False -> plain backward
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(
            base.model, use_checkpoint=True, remat_policy=policy),
    )
    l0, g0 = _loss_and_grads(base, batch)
    l1, g1 = _loss_and_grads(cfg, batch)
    assert np.isfinite(l0) and abs(l0 - l1) < 1e-5 * max(1.0, abs(l0))
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_unknown_policy_rejected():
    from octfusion_tpu.nn.modules import remat_transform

    with pytest.raises(ValueError):
        remat_transform("bogus")
