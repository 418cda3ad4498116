"""Dense voxel ("lr") 3D U-Net
(`/root/reference/models/networks/diffusion_networks/graph_unet_lr.py`).

Operates NDHWC on the ``[B, S, S, S, 8]`` split grid (S = 2**full_depth).
``as_middle`` mode lets the hr graph U-Net use this network as its middle
block: the hr features are voxelised at full_depth, run through the body,
and re-gathered at the node coordinates (`graph_unet_lr.py:175-182`).

Note: the reference's training-time lr self-conditioning pre-pass is inert
(the value is passed under the wrong kwarg, SURVEY.md §2.1 "union U-Net
wrapper"), so training always sees ``x_self_cond = 0``; sampling feeds the
previous x0 estimate.  We reproduce that behaviour.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from . import modules
from .modules import swish


class UNetLR(nn.Module):
    full_depth: int = 4
    in_channels: int = 8
    model_channels: int = 64
    out_channels: int = 8
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    attention_resolutions: Tuple[int, ...] = (2, 4)
    num_heads: int = 4
    dropout: float = 0.0
    num_classes: Optional[int] = None

    def setup(self):
        mc = self.model_channels
        channels = [mc] + [mc * m for m in self.channel_mult]
        in_out = list(zip(channels[:-1], channels[1:]))
        ted = mc * 4
        self.time_pos_emb = modules.LearnedSinusoidalPosEmb(mc, name="time_pos_emb")
        self.time_emb_1 = nn.Dense(ted, name="time_emb_1")
        self.time_emb_2 = nn.Dense(ted, name="time_emb_2")
        if self.num_classes is not None:
            self.label_emb = nn.Embed(self.num_classes, ted, name="label_emb")
        self.input_emb = modules.ConvNd(mc, name="input_emb")

        downs = []
        num_res = len(in_out)
        ds = 1
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            downs.append((
                modules.ResnetBlock3D(
                    dim_in, dim_out, ted, self.dropout, name=f"down_{ind}_res"
                ),
                (modules.VoxelGroupNorm(dim_out, name=f"down_{ind}_attnnorm"),
                 modules.AttentionBlock3D(
                     dim_out, self.num_heads, name=f"down_{ind}_attn"))
                if ds in self.attention_resolutions else None,
                modules.ConvDownsample3D(dim_out, name=f"down_{ind}_ds")
                if not is_last else None,
            ))
            if not is_last:
                ds *= 2
        self.downs = downs

        mid = channels[-1]
        self.mid_block1 = modules.ResnetBlock3D(
            mid, mid, ted, self.dropout, name="mid_block1"
        )
        self.mid_attn = (
            (modules.VoxelGroupNorm(mid, name="mid_attnnorm"),
             modules.AttentionBlock3D(mid, self.num_heads, name="mid_attn"))
            if ds in self.attention_resolutions else None
        )
        self.mid_block2 = modules.ResnetBlock3D(
            mid, mid, ted, self.dropout, name="mid_block2"
        )

        ups = []
        for ind, (dim_in, dim_out) in enumerate(reversed(in_out[1:])):
            is_last = ind >= num_res - 1
            ups.append((
                modules.ResnetBlock3D(
                    dim_out * 2, dim_in, ted, self.dropout, name=f"up_{ind}_res"
                ),
                (modules.VoxelGroupNorm(dim_in, name=f"up_{ind}_attnnorm"),
                 modules.AttentionBlock3D(
                     dim_in, self.num_heads, name=f"up_{ind}_attn"))
                if ds in self.attention_resolutions else None,
                modules.ConvUpsample3D(dim_in, name=f"up_{ind}_us")
                if not is_last else None,
            ))
            if not is_last:
                ds //= 2
        self.ups = ups
        self.end_norm = modules.VoxelGroupNorm(mc, name="end_norm")
        self.out = modules.ConvNd(self.out_channels, name="out")

    def _embed_time(self, timesteps, label):
        e = self.time_pos_emb(timesteps)
        e = self.time_emb_2(swish(self.time_emb_1(e)))
        if self.num_classes is not None:
            assert label is not None
            e = e + self.label_emb(label)
        return e

    def __call__(
        self,
        x,                       # [B, S, S, S, C]
        timesteps,               # [B]
        x_self_cond=None,
        label=None,
        as_middle: bool = False,
        deterministic: bool = True,
    ):
        if not as_middle:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x, x_self_cond], axis=-1)
            x = self.input_emb(x)
        emb = self._embed_time(timesteps, label)

        hs = []
        for res, attn, down in self.downs:
            x = res(x, emb, deterministic)
            if attn is not None:
                norm, a = attn
                x = a(swish(norm(x)))
            hs.append(x)
            if down is not None:
                x = down(x)

        x = self.mid_block1(x, emb, deterministic)
        if self.mid_attn is not None:
            norm, a = self.mid_attn
            x = a(swish(norm(x)))
        x = self.mid_block2(x, emb, deterministic)

        for res, attn, up in self.ups:
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = res(x, emb, deterministic)
            if attn is not None:
                norm, a = attn
                x = a(swish(norm(x)))
            if up is not None:
                x = up(x)

        x = swish(self.end_norm(x))
        if as_middle:
            return x
        return self.out(x)

    def forward_as_middle(self, h, g, d, timesteps, label):
        """Graph features at the bottom level (== full_depth voxel level) ->
        voxel body -> gathered back onto the same layout
        (`graph_unet_lr.py:175-182`)."""
        from ..ops import graph_ops

        octree = g.octree
        h_cur = graph_ops._cur_segment(h, g, d)
        grid = octree.to_voxel(h_cur, self.full_depth)
        grid = self(grid, timesteps, label=label, as_middle=True)
        out_cur = octree.from_voxel(grid, self.full_depth)
        pad = jnp.zeros((g.spec.cur_off(d), out_cur.shape[-1]), out_cur.dtype)
        return jnp.concatenate([pad, out_cur], axis=0)
