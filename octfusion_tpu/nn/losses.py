"""VAE geometry losses
(`/root/reference/models/networks/dualoctree_networks/loss.py`).

The SDF-gradient supervision differentiates the MPU w.r.t. query positions
*inside* the training loss (`loss.py:13-20` uses create_graph=True, i.e.
double backward).  Here the inner spatial gradient is forward-mode (3 JVPs —
query dim is 3), which composes cheaply with the outer reverse-mode pass.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..octree.octree import Octree
from ..ops import mpu as mpu_ops


def octree_split_loss(logits: Dict[int, jnp.ndarray], octree: Octree):
    """Per-depth split cross-entropy + accuracy (`loss.py:100-112`)."""
    out = {}
    for d, logit in logits.items():
        mask = octree.node_mask(d)
        label = octree.nempty_mask(d).astype(jnp.int32)
        logp = jax.nn.log_softmax(logit.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, label[:, None], axis=-1)[:, 0]
        denom = jnp.maximum(jnp.sum(mask), 1)
        out[f"loss_{d}"] = jnp.sum(jnp.where(mask, ce, 0.0)) / denom
        pred = jnp.argmax(logit, axis=-1)
        out[f"accu_{d}"] = (
            jnp.sum(jnp.where(mask, (pred == label), False)) / denom
        )
    return out


def mpu_with_grad(pos, pt_batch, reg_levels, octree, full_depth, depth_end):
    """(sdf [N], dsdf/dpos [N,3]) — inner gradient via 3 forward-mode JVPs."""

    def f(p):
        return mpu_ops.mpu_eval(
            p, pt_batch, reg_levels, octree, full_depth, depth_end
        )[0]

    sdf = f(pos)
    grads = []
    for axis in range(3):
        tangent = jnp.zeros_like(pos).at[:, axis].set(1.0)
        _, dsdf = jax.jvp(f, (pos,), (tangent,))
        grads.append(dsdf)
    return sdf, jnp.stack(grads, axis=-1)


def sdf_reg_loss(sdf, grad, sdf_gt, grad_gt, suffix=""):
    """200*mse(sdf) + 1*mse(grad) (`loss.py:23-30`)."""
    return {
        f"sdf_loss{suffix}": jnp.mean((sdf - sdf_gt) ** 2) * 200.0,
        f"grad_loss{suffix}": jnp.mean((grad - grad_gt) ** 2) * 1.0,
    }


def _masked_mean(x, m):
    return jnp.sum(jnp.where(m, x, 0.0)) / jnp.maximum(jnp.sum(m), 1)


def sdf_grad_loss(sdf, grad, sdf_gt, grad_gt, suffix=""):
    """Surface/eikonal variant (`loss.py:32-45`): points with sdf_gt == -1
    are off-surface dummies."""
    on = sdf_gt != -1
    off = ~on
    return {
        f"sdf_loss{suffix}": _masked_mean(sdf**2, on) * 200.0,
        f"norm_loss{suffix}": _masked_mean(
            jnp.mean((grad - grad_gt) ** 2, -1), on
        ),
        f"inter_loss{suffix}": _masked_mean(
            jnp.exp(-40.0 * jnp.abs(sdf)), off
        ) * 0.1,
        f"grad_loss{suffix}": _masked_mean(
            jnp.abs(jnp.linalg.norm(grad, axis=-1) - 1.0), off
        ) * 0.1,
    }


def possion_grad_loss(sdf, grad, sdf_gt, grad_gt, suffix=""):
    """Poisson-style variant (`loss.py:65-80`): sdf_gt == 0 marks surface,
    == 1 marks out-of-bbox points."""
    on = sdf_gt == 0
    oob = sdf_gt == 1.0
    off = ~on
    return {
        f"sdf_loss{suffix}": _masked_mean(sdf**2, on) * 200.0,
        f"norm_loss{suffix}": _masked_mean(
            jnp.sum((grad - grad_gt) ** 2, -1), on
        ),
        f"inter_loss{suffix}": _masked_mean(
            jnp.exp(-40.0 * jnp.abs(sdf)), off
        ) * 0.1,
        f"grad_loss{suffix}": _masked_mean(
            jnp.sum(grad**2, -1), off
        ) * 0.1,
        f"bbox_loss{suffix}": _masked_mean(jax.nn.relu(-sdf), oob) * 100.0,
    }


LOSS_FUNCTIONS = {
    "sdf_reg_loss": sdf_reg_loss,
    "sdf_grad_loss": sdf_grad_loss,
    "possion_grad_loss": possion_grad_loss,
}


def geometry_loss(
    vae_out: Dict,
    pos: jnp.ndarray,
    pt_batch: jnp.ndarray,
    sdf_gt: jnp.ndarray,
    grad_gt: jnp.ndarray,
    full_depth: int,
    depth_stop: int,
    depth_out: int,
    kl_weight: float = 0.1,
    loss_type: str = "sdf_reg_loss",
    spatial_grad: str = "analytic",
):
    """Full VAE objective (`loss.py:164-178`): per-depth split CE, per-depth
    SDF+gradient regression, KL.  Returns a dict including the scalar
    'loss'.

    ``spatial_grad='analytic'`` (default) evaluates each depth's SDF and
    its spatial gradient in ONE pass (`ops/mpu.mpu_eval_grad`) with the
    corner lookups shared across the depth_stop..depth_out targets;
    ``'jvp'`` keeps the original 4-pass (primal + 3 forward-mode JVPs)
    formulation per target with no sharing — numerically identical
    (tests/test_vae_mpu.py pins parity), retained for oracle tests and
    the train-step profiler's before/after attribution."""
    reg_fn = LOSS_FUNCTIONS[loss_type]
    octree_out = vae_out["octree_out"]
    output = octree_split_loss(vae_out["logits"], octree_out)
    cache = None
    if spatial_grad == "analytic":
        cache = {
            dd: mpu_ops.octree_corner_info(octree_out, dd, pos, pt_batch)
            for dd in range(full_depth, depth_out + 1)
        }
    for d in range(depth_stop, depth_out + 1):
        if spatial_grad == "analytic":
            sdf, grad = mpu_ops.mpu_eval_grad(
                pos, pt_batch, vae_out["reg_voxs"][d], octree_out,
                full_depth, d, corner_cache=cache,
            )
        else:
            sdf, grad = mpu_with_grad(
                pos, pt_batch, vae_out["reg_voxs"][d], octree_out,
                full_depth, d,
            )
        output.update(reg_fn(sdf, grad, sdf_gt, grad_gt, f"_{d}"))
    output["kl_loss"] = kl_weight * vae_out["kl_loss"]
    total = sum(v for k, v in output.items() if "loss" in k)
    output["loss"] = total
    return output


def geometry_color_loss(
    vae_out: Dict,
    pos: jnp.ndarray,
    pt_batch: jnp.ndarray,
    sdf_gt: jnp.ndarray,
    grad_gt: jnp.ndarray,
    color_pos: jnp.ndarray,
    color_batch: jnp.ndarray,
    color_gt: jnp.ndarray,
    full_depth: int,
    depth_stop: int,
    depth_out: int,
    kl_weight: float = 0.1,
    loss_type: str = "sdf_reg_loss",
):
    """geometry_loss + per-depth color regression
    (`loss.py:180-197` geometry_color_loss; `loss.py:82-88` 200x mse).
    Predicted per-node colors are blended at the surface supervision points
    with the same partition-of-unity weights as the SDF."""
    from ..ops import mpu as mpu_ops

    output = geometry_loss(
        vae_out, pos, pt_batch, sdf_gt, grad_gt, full_depth, depth_stop,
        depth_out, kl_weight=kl_weight, loss_type=loss_type,
    )
    octree_out = vae_out["octree_out"]
    total = output.pop("loss")
    for d in range(depth_stop, depth_out + 1):
        pred = mpu_ops.mpu_interp(
            color_pos, color_batch, vae_out["colors"][d], octree_out,
            full_depth, d,
        )
        closs = 200.0 * jnp.mean((pred - color_gt) ** 2)
        output[f"color_loss_{d}"] = closs
        total = total + closs
    output["loss"] = total
    return output
