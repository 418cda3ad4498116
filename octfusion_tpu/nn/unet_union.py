"""Union wrapper bundling the per-stage U-Nets
(`/root/reference/models/networks/diffusion_networks/graph_unet_union.py`).

Stages are configured by parallel per-stage lists exactly like the reference
YAML (`configs/octfusion_snet_uncond.yaml:11-27`); construction stops at
``stage_flag``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..octree.dual_graph import DualGraph
from . import unet_hr, unet_lr


@dataclasses.dataclass(frozen=True)
class UnionConfig:
    unet_type: Tuple[str, ...] = ("lr", "hr")
    df_type: Tuple[str, ...] = ("x0", "eps")
    input_depth: Tuple[int, ...] = (4, 6)
    full_depth: int = 4
    input_channels: Tuple[int, ...] = (8, 3)
    out_channels: Tuple[int, ...] = (8, 3)
    model_channels: Tuple[int, ...] = (64, 128)
    num_res_blocks: Tuple[Tuple[int, ...], ...] = ((1, 1, 1), (1, 1, 0))
    channel_mult: Tuple[Tuple[int, ...], ...] = ((1, 2, 4), (1, 2, 4))
    attention_resolutions: Tuple[int, ...] = (2, 4)
    num_heads: int = 4
    num_classes: Optional[int] = None
    use_checkpoint: bool = True
    # 'bfloat16' runs the U-Net bodies in bf16 (params stay fp32; norms
    # compute fp32 stats); outputs are cast back to fp32
    compute_dtype: str = "float32"

    def stage_index(self, stage: str) -> int:
        return self.unet_type.index(stage)


class UNetUnion(nn.Module):
    config: UnionConfig
    stage_flag: str = "hr"

    def setup(self):
        cfg = self.config
        unet_lr_m = None
        unet_hr_m = None
        unet_feature_m = None
        for i, kind in enumerate(cfg.unet_type):
            if kind == "lr":
                unet_lr_m = unet_lr.UNetLR(
                    full_depth=cfg.full_depth,
                    in_channels=cfg.input_channels[i],
                    model_channels=cfg.model_channels[i],
                    out_channels=cfg.out_channels[i],
                    channel_mult=tuple(cfg.channel_mult[i]),
                    attention_resolutions=tuple(cfg.attention_resolutions),
                    num_heads=cfg.num_heads,
                    num_classes=cfg.num_classes,
                    name="unet_lr",
                )
            elif kind in ("hr", "feature"):
                m = unet_hr.UNetHR(
                    input_depth=cfg.input_depth[i],
                    full_depth=cfg.full_depth,
                    in_channels=cfg.input_channels[i],
                    model_channels=cfg.model_channels[i],
                    lr_model_channels=cfg.model_channels[i - 1],
                    out_channels=cfg.out_channels[i],
                    num_res_blocks=tuple(cfg.num_res_blocks[i]),
                    channel_mult=tuple(cfg.channel_mult[i]),
                    num_classes=cfg.num_classes,
                    use_checkpoint=cfg.use_checkpoint,
                    name=f"unet_{kind}",
                )
                if kind == "hr":
                    unet_hr_m = m
                else:
                    unet_feature_m = m
            else:
                raise ValueError(kind)
            if kind == self.stage_flag:
                break
        self.unet_lr_m = unet_lr_m
        self.unet_hr_m = unet_hr_m
        self.unet_feature_m = unet_feature_m

    def warmup(self, lr_x, hr_x, g, timesteps, label=None, feature_x=None,
               g_feature=None):
        """Touch every constructed stage once so ``init`` materialises the
        full parameter tree (flax creates params lazily per code path)."""
        outs = 0.0
        if self.unet_lr_m is not None and lr_x is not None:
            outs += jnp.sum(self(
                "lr", lr_x, timesteps, label=label
            ))
        if self.unet_hr_m is not None and hr_x is not None:
            outs += jnp.sum(self(
                "hr", hr_x, timesteps, g=g, label=label
            ))
        if self.unet_feature_m is not None and feature_x is not None:
            outs += jnp.sum(self(
                "feature", feature_x, timesteps, g=g_feature, label=label
            ))
        return outs

    def __call__(
        self,
        unet_type: str,
        x,
        timesteps,
        g: Optional[DualGraph] = None,
        x_self_cond=None,
        label=None,
        with_lr_middle: bool = True,
        deterministic: bool = True,
    ):
        dt = jnp.dtype(self.config.compute_dtype)
        in_dt = x.dtype
        x = x.astype(dt)
        if x_self_cond is not None:
            x_self_cond = x_self_cond.astype(dt)
        if unet_type == "lr":
            return self.unet_lr_m(
                x, timesteps, x_self_cond=x_self_cond, label=label,
                deterministic=deterministic,
            ).astype(in_dt)
        if unet_type == "hr":
            lr_apply = (
                self.unet_lr_m.forward_as_middle if with_lr_middle else None
            )
            return self.unet_hr_m(
                x, g, timesteps, lr_apply=lr_apply, label=label,
                deterministic=deterministic,
            ).astype(in_dt)
        if unet_type == "feature":
            hr_apply = (
                (lambda h, gg, d, t, lb: self.unet_hr_m(
                    h, gg, t, lr_apply=None, label=lb, as_middle=True,
                    deterministic=deterministic,
                ))
                if with_lr_middle else None
            )
            return self.unet_feature_m(
                x, g, timesteps, lr_apply=hr_apply, label=label,
                deterministic=deterministic,
            ).astype(in_dt)
        raise ValueError(unet_type)
