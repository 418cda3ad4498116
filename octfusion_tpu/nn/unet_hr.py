"""Graph ("hr") U-Net over the dual octree
(`/root/reference/models/networks/diffusion_networks/graph_unet_hr.py`).

Encoder descends graph levels ``input_depth .. input_depth - len(mult) + 1``
with timestep-conditioned graph residual blocks; the middle block is the
(frozen) lr voxel U-Net run body-only on the voxelised bottom level
(`graph_unet_hr.py:257-262`); the decoder mirrors upward with skip concats;
the output conv is zero-initialised.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..octree.dual_graph import DualGraph
from . import modules
from .modules import swish, timestep_embedding


class UNetHR(nn.Module):
    input_depth: int = 6
    full_depth: int = 4
    in_channels: int = 3
    model_channels: int = 128
    lr_model_channels: int = 64
    out_channels: int = 3
    num_res_blocks: Tuple[int, ...] = (1, 1, 0)
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    dropout: float = 0.0
    num_classes: Optional[int] = None
    use_checkpoint: bool = True

    def setup(self):
        mc = self.model_channels
        ted = mc * 4
        self.time_embed_1 = nn.Dense(ted, name="time_embed_1")
        self.time_embed_2 = nn.Dense(ted, name="time_embed_2")
        if self.num_classes is not None:
            self.label_emb = nn.Embed(self.num_classes, ted, name="label_emb")

        d = self.input_depth
        self.input_conv = modules.GraphConv(
            self.in_channels, mc, n_node_type=d - 1, name="input_conv"
        )
        blocks = []           # ('res', module, d) | ('down', module, d)
        chans = [mc]
        ch = mc
        bi = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks[level]):
                blocks.append((
                    "res",
                    modules.GraphResBlockEmbed(
                        ch, ted, mult * mc, self.dropout, d - 1,
                        self.use_checkpoint, name=f"input_{bi}",
                    ),
                    d,
                ))
                bi += 1
                ch = mult * mc
                chans.append(ch)
            if level != len(self.channel_mult) - 1:
                d -= 1
                blocks.append((
                    "down",
                    modules.GraphDownsampleDiff(
                        ch, ch, n_node_type=d - 1, name=f"input_{bi}",
                    ),
                    d + 1,  # GraphDownsampleDiff takes the source level d
                ))
                bi += 1
                chans.append(ch)
        self.input_blocks = blocks
        self._input_chans = chans
        self._bottom_depth = d

        self.middle_block1 = modules.GraphResBlockEmbed(
            ch, ted, self.lr_model_channels, self.dropout, d - 1,
            self.use_checkpoint, name="middle_block1",
        )
        self.middle_block2 = modules.GraphResBlockEmbed(
            self.lr_model_channels * 2, ted, ch, self.dropout, d - 1,
            self.use_checkpoint, name="middle_block2",
        )

        out_blocks = []
        bo = 0
        skip = list(chans)
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks[level] + 1):
                ich = skip.pop()
                out_blocks.append((
                    "res",
                    modules.GraphResBlockEmbed(
                        ch + ich, ted, mc * mult, self.dropout, d - 1,
                        self.use_checkpoint, name=f"output_{bo}",
                    ),
                    d,
                ))
                bo += 1
                ch = mc * mult
                if level and i == self.num_res_blocks[level]:
                    d += 1
                    out_blocks.append((
                        "up",
                        modules.GraphUpsampleDiff(
                            ch, ch, n_node_type=d - 1, name=f"output_{bo}",
                        ),
                        d,
                    ))
                    bo += 1
        self.output_blocks = out_blocks
        self.end_norm = modules.DualOctreeGroupNorm(ch, name="end_norm")
        self.out_conv = modules.GraphConv(
            ch, self.out_channels, n_node_type=self.input_depth - 1,
            zero_init=True, name="out",
        )

    def _embed(self, timesteps, label):
        e = timestep_embedding(timesteps, self.model_channels)
        e = self.time_embed_2(swish(self.time_embed_1(e)))
        if self.num_classes is not None:
            assert label is not None
            e = e + self.label_emb(label)
        return e

    def __call__(
        self,
        x,                        # [G_cap(input_depth), C]
        g: DualGraph,
        timesteps,                # [B]
        lr_apply=None,            # fn(h_bottom, octree, t, label) -> features
        label=None,
        as_middle: bool = False,
        deterministic: bool = True,
    ):
        emb = self._embed(timesteps, label)
        if not as_middle:
            h = self.input_conv(x, g.level(self.input_depth))
        else:
            h = x
        hs = [h]
        for kind, mod, d in self.input_blocks:
            if kind == "res":
                h = mod(h, emb, g.level(d), deterministic)
            else:  # down: mod consumes level d (source), produces d-1
                h = mod(h, g, d)
            hs.append(h)

        d = self._bottom_depth
        if lr_apply is not None:
            h = self.middle_block1(h, emb, g.level(d), deterministic)
            # lr_apply maps the full bottom-level layout to features on the
            # same layout (voxel U-Net body or a coarser graph U-Net body)
            h_lr = lr_apply(h, g, d, timesteps, label)
            h = jnp.concatenate([h, h_lr], axis=-1)
            h = self.middle_block2(h, emb, g.level(d), deterministic)

        for kind, mod, d in self.output_blocks:
            if kind == "res":
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = mod(h, emb, g.level(d), deterministic)
            else:  # up: mod consumes level d-1, produces level d
                h = mod(h, g, d)

        h = swish(self.end_norm(h, g.level(self.input_depth)))
        if as_middle:
            return h
        return self.out_conv(h, g.level(self.input_depth))
