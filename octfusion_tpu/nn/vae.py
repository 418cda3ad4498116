"""Graph VAE on the dual octree
(`/root/reference/models/networks/dualoctree_networks/graph_vae.py`).

Encoder: GraphConv stem + residual blocks + leaf-preserving downsamples from
``depth`` to ``depth_stop``; a 1x1 head produces a diagonal Gaussian over
``embed_dim`` channels per level-``depth_stop`` vertex.  Decoder mirrors it
upward, emitting per-level split logits and MPU plane parameters; at
inference the octree is grown level by level from the predicted splits
(`graph_vae.py:202-210`) — here via masked split/grow + incremental dual
graph extension, all jittable.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..octree.dual_graph import DualGraph, build_dual_graph, extend_dual_graph
from ..octree.octree import Octree, create_full_octree
from ..ops import graph_ops
from . import distributions, modules

# channels per octree depth (`graph_vae.py:125`)
DEFAULT_CHANNELS = (4, 512, 512, 256, 128, 64, 32, 32, 24, 8)


def copy_topology_octree(octree_in: Octree, to_depth: int) -> Octree:
    """Fresh octree whose topology up to ``to_depth`` copies ``octree_in``
    (`graph_vae.py:236-244` create_child_octree)."""
    out = create_full_octree(octree_in.spec)
    for d in range(octree_in.full_depth, to_depth):
        label = octree_in.nempty_mask(d).astype(jnp.int32)
        out = out.octree_split(label, d)
        out = out.octree_grow(d + 1)
    return out


class PredictHead(nn.Module):
    """Conv1x1GnGelu + Conv1x1 (`graph_vae.py:127-130`)."""

    channel_in: int
    channel_out: int
    num_hidden: int = 32

    @nn.compact
    def __call__(self, x, lvl):
        x = modules.Conv1x1GnGelu(self.channel_in, self.num_hidden, name="head0")(
            x, lvl
        )
        x = modules.Conv1x1(
            self.num_hidden, self.channel_out, use_bias=True, name="head1"
        )(x)
        return x


class GraphVAE(nn.Module):
    depth: int = 8
    channel_in: int = 4
    full_depth: int = 4
    depth_stop: int = 6
    depth_out: int = 8
    embed_dim: int = 3
    resblk_num: int = 2
    channels: Tuple[int, ...] = DEFAULT_CHANNELS
    use_checkpoint: bool = True
    remat_policy: str = "full"
    # optional per-node color regression (the reference's `load_color` /
    # geometry_color_loss capability, `loss.py:180-197`); 0 = off
    color_channel: int = 0

    def setup(self):
        depth, ds = self.depth, self.depth_stop
        ch = self.channels
        self.conv1 = modules.GraphConv(
            self.channel_in, ch[depth], n_node_type=depth - 1, name="conv1"
        )
        self.encoder_blocks = [
            modules.GraphResBlocks(
                ch[d], ch[d], self.resblk_num - 1,
                n_node_type=d - 1, use_checkpoint=self.use_checkpoint,
                remat_policy=self.remat_policy,
                name=f"encoder_{i}",
            )
            for i, d in enumerate(range(depth, ds - 1, -1))
        ]
        self.downsamples = [
            modules.GraphDownsampleVAE(ch[d], ch[d - 1], name=f"downsample_{i}")
            for i, d in enumerate(range(depth, ds, -1))
        ]
        self.encoder_norm_out = modules.DualOctreeGroupNorm(
            ch[ds], name="encoder_norm_out"
        )
        self.KL_conv = modules.Conv1x1(
            ch[ds], 2 * self.embed_dim, use_bias=True, name="KL_conv"
        )
        self.post_KL_conv = modules.Conv1x1(
            self.embed_dim, ch[ds], use_bias=True, name="post_KL_conv"
        )
        self.decoder_mid_1 = modules.GraphResBlocks(
            ch[ds], ch[ds], self.resblk_num, n_node_type=ds - 1,
            use_checkpoint=self.use_checkpoint,
            remat_policy=self.remat_policy, name="decoder_mid_block_1",
        )
        self.decoder_mid_2 = modules.GraphResBlocks(
            ch[ds], ch[ds], self.resblk_num, n_node_type=ds - 1,
            use_checkpoint=self.use_checkpoint,
            remat_policy=self.remat_policy, name="decoder_mid_block_2",
        )
        self.decoder_blocks = [
            modules.GraphResBlocks(
                ch[d], ch[d], self.resblk_num, n_node_type=d - 1,
                use_checkpoint=self.use_checkpoint,
                remat_policy=self.remat_policy, name=f"decoder_{i}",
            )
            for i, d in enumerate(range(ds, self.depth_out + 1))
        ]
        self.upsamples = [
            modules.GraphUpsampleVAE(ch[d - 1], ch[d], name=f"upsample_{i}")
            for i, d in enumerate(range(ds + 1, self.depth_out + 1))
        ]
        self.predict = [
            PredictHead(ch[d], 2, name=f"predict_{i}")
            for i, d in enumerate(range(ds, self.depth_out + 1))
        ]
        self.regress = [
            PredictHead(ch[d], 4, name=f"regress_{i}")
            for i, d in enumerate(range(ds, self.depth_out + 1))
        ]
        if self.color_channel > 0:
            self.color_heads = [
                PredictHead(ch[d], self.color_channel, name=f"color_{i}")
                for i, d in enumerate(range(ds, self.depth_out + 1))
            ]

    # ------------------------------------------------------------------
    def encode(self, g: DualGraph):
        """-> (mean, logvar) on the level-``depth_stop`` vertex layout
        (`graph_vae.py:135-169`)."""
        depth, ds = self.depth, self.depth_stop
        x = graph_ops.level_input_feature(g)
        for i, d in enumerate(range(depth, ds - 1, -1)):
            if d == depth:
                x = self.conv1(x, g.level(d))
            x = self.encoder_blocks[i](x, g.level(d))
            if d > ds:
                x = self.downsamples[i](x, g, d)
        x = self.encoder_norm_out(x, g.level(ds))
        x = jax.nn.gelu(x, approximate=False)
        code = self.KL_conv(x)
        mask = g.level(ds).node_mask[:, None]
        code = jnp.where(mask, code, 0.0)
        return distributions.split_params(code)

    # ------------------------------------------------------------------
    def _decode_level(self, i, d, x, g):
        x = self.decoder_blocks[i](x, g.level(d))
        logit = self.predict[i](x, g.level(d))
        logit_cur = graph_ops._cur_segment(logit, g, d)
        return x, logit_cur

    def decode(self, code, g: DualGraph) -> Dict:
        """Fixed-topology decode (training; `graph_vae.py:171-223` with
        update_octree=False)."""
        ds = self.depth_stop
        x = self.post_KL_conv(code)
        x = self.decoder_mid_1(x, g.level(ds))
        x = self.decoder_mid_2(x, g.level(ds))
        logits, reg_voxs, colors = {}, {}, {}
        for i, d in enumerate(range(ds, self.depth_out + 1)):
            if d > ds:
                x = self.upsamples[i - 1](x, g, d)
            x, logits[d] = self._decode_level(i, d, x, g)
            reg = self.regress[i](x, g.level(d))
            reg_voxs[d] = graph_ops.graph_to_level_arrays(reg, g, d)
            if self.color_channel > 0:
                col = self.color_heads[i](x, g.level(d))
                colors[d] = graph_ops.graph_to_level_arrays(col, g, d)
        out = {"logits": logits, "reg_voxs": reg_voxs, "octree_out": g.octree,
               "graph_out": g}
        if self.color_channel > 0:
            out["colors"] = colors
        return out

    def decode_grow(self, code, g: DualGraph) -> Dict:
        """Growing decode (inference): split each level from predicted
        logits, grow, extend the dual graph, continue.  ``g`` must cover
        levels up to ``depth_stop`` of an octree whose topology matches the
        code's layout (`decode_code`, `graph_vae.py:300-324`)."""
        ds = self.depth_stop
        octree = g.octree
        x = self.post_KL_conv(code)
        x = self.decoder_mid_1(x, g.level(ds))
        x = self.decoder_mid_2(x, g.level(ds))
        logits, reg_voxs, colors = {}, {}, {}
        for i, d in enumerate(range(ds, self.depth_out + 1)):
            if d > ds:
                x = self.upsamples[i - 1](x, g, d)
            x, logits[d] = self._decode_level(i, d, x, g)
            if d < self.depth_out:
                label = jnp.argmax(logits[d], axis=-1).astype(jnp.int32)
                octree = octree.octree_split(label, d)
                octree = octree.octree_grow(d + 1)
                g = extend_dual_graph(g.replace(octree=octree), octree)
            reg = self.regress[i](x, g.level(d))
            reg_voxs[d] = graph_ops.graph_to_level_arrays(reg, g, d)
            if self.color_channel > 0:
                col = self.color_heads[i](x, g.level(d))
                colors[d] = graph_ops.graph_to_level_arrays(col, g, d)
        out = {"logits": logits, "reg_voxs": reg_voxs, "octree_out": octree,
               "graph_out": g}
        if self.color_channel > 0:
            out["colors"] = colors
        return out

    # ------------------------------------------------------------------
    def __call__(self, g_in: DualGraph, g_out: Optional[DualGraph],
                 sample_key) -> Dict:
        """Autoencode (`graph_vae.py:246-289`).  If ``g_out`` is None the
        decoder grows its own octree from the input topology."""
        mean, logvar = self.encode(g_in)
        z = distributions.sample(sample_key, mean, logvar)
        if g_out is None:
            octree_out = copy_topology_octree(g_in.octree, self.depth_stop)
            g_dec = build_dual_graph(
                octree_out, self.spec_edge_factor(g_in), up_to=self.depth_stop
            )
            out = self.decode_grow(z, g_dec)
        else:
            out = self.decode(z, g_out)
        mask = g_in.level(self.depth_stop).node_mask
        kl_elem = distributions.kl(mean, logvar)
        kl_mean = jnp.sum(
            jnp.where(mask[:, None], kl_elem, 0.0)
        ) / jnp.maximum(jnp.sum(mask) * self.embed_dim, 1)
        out["kl_loss"] = kl_mean
        out["code"] = z
        out["code_max"] = jnp.max(jnp.where(mask[:, None], z, -jnp.inf))
        out["code_min"] = jnp.min(jnp.where(mask[:, None], z, jnp.inf))
        return out

    @staticmethod
    def spec_edge_factor(g: DualGraph) -> int:
        return g.spec.edge_factor

    def extract_code(self, g_in: DualGraph, sample_key):
        """Sampled latent codes on the level-``depth_stop`` layout for
        diffusion training (`graph_vae.py:291-298`)."""
        mean, logvar = self.encode(g_in)
        return distributions.sample(sample_key, mean, logvar)
