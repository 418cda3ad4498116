"""Flax modules for dual-octree graph networks and dense 3D U-Nets.

Parity targets are cited as `file:line` into /root/reference; architecture
(static padded vertex layouts, segment ops, NDHWC dense convs) is TPU-native,
not a translation.

Parameter naming is chosen so the torch->jax checkpoint converter
(`octfusion_tpu/utils/torch_convert.py`) can map the reference state dicts
1:1.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..octree.dual_graph import DualGraph, GraphLevel, N_EDGE_TYPE
from ..ops import graph_ops


def swish(x):
    return x * jax.nn.sigmoid(x)


def remat_transform(policy: str):
    """Resolve a remat-policy name to a flax module transform (or None).

    The reference remats every res-block wholesale (ckpt_conv_wrapper,
    `modules.py:593-641`), which on TPU makes the backward pass re-run the
    full forward — measured at 77% of the full-cap VAE train step
    (`results/vae_step_profile.json`).  Policies trade HBM for that
    recompute:

      "full"  save nothing, recompute everything (reference behaviour)
      "conv"  save only the GraphConv outputs (tagged ``graph_conv`` via
              ``checkpoint_name``) — the matmul-heavy ops are not re-run
              in the backward; the cheap norm/swish glue still is
      "dots"  XLA's dots_saveable policy (save every matmul result; does
              NOT cover pallas/custom-vjp convs, hence "conv" above)
      "none"  no remat (peak-memory baseline)
    """
    if policy == "none":
        return None
    if policy == "conv":
        return lambda body: nn.remat(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "graph_conv"),
        )
    if policy == "dots":
        return lambda body: nn.remat(
            body, policy=jax.checkpoint_policies.dots_saveable)
    if policy == "full":
        return nn.remat
    raise ValueError(f"unknown remat policy: {policy!r}")


def group_count(channels: int, group: int = 32) -> int:
    """Group-size rules of the reference (`modules.py:271-274`)."""
    group = min(group, channels)
    if channels <= 32:
        group = channels // 4
    elif channels % group != 0:
        group = 30
    assert channels % group == 0
    return group


# ----------------------------------------------------------------------
# graph modules
# ----------------------------------------------------------------------
class GraphConv(nn.Module):
    """7-edge-type graph convolution (`modules.py:163-220`)."""

    in_channels: int
    out_channels: int
    n_edge_type: int = N_EDGE_TYPE
    avg_degree: int = 7
    n_node_type: int = 0
    use_bias: bool = False
    zero_init: bool = False  # reference zero_module() wrapping

    @nn.compact
    def __call__(self, x, lvl: GraphLevel):
        node_ch = self.n_node_type if self.n_node_type > 1 else 0
        fan_in = self.avg_degree * self.in_channels
        fan_out = self.avg_degree * self.out_channels
        std = math.sqrt(2.0 / (fan_in + fan_out))
        a = math.sqrt(3.0) * std
        init = (
            nn.initializers.zeros
            if self.zero_init
            else (lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -a, a))
        )
        w = self.param(
            "weights",
            init,
            (self.n_edge_type * (self.in_channels + node_ch), self.out_channels),
        )
        out = graph_ops.graph_conv(x, w.astype(x.dtype), lvl, self.n_node_type)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b.astype(out.dtype)
        return out


class DualOctreeGroupNorm(nn.Module):
    """Per-sample group norm over variable-length vertex sets
    (`modules.py:262-330`)."""

    in_channels: int
    group: int = 32

    @nn.compact
    def __call__(self, x, lvl: GraphLevel):
        g = group_count(self.in_channels, self.group)
        scale = self.param("weights", nn.initializers.ones, (self.in_channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.in_channels,))
        return graph_ops.dual_group_norm(x, lvl, scale, bias, g)


class Conv1x1(nn.Module):
    """Per-vertex linear layer (`modules.py:332-339`)."""

    in_channels: int
    out_channels: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(
            self.out_channels,
            use_bias=self.use_bias,
            name="linear",
            kernel_init=nn.initializers.lecun_normal(),
        )(x)
        return y


class Conv1x1Gn(nn.Module):
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, lvl):
        x = Conv1x1(self.in_channels, self.out_channels, name="conv")(x)
        x = DualOctreeGroupNorm(self.out_channels, name="gn")(x, lvl)
        return x


class Conv1x1GnGelu(nn.Module):
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, lvl):
        x = Conv1x1(self.in_channels, self.out_channels, name="conv")(x)
        x = DualOctreeGroupNorm(self.out_channels, name="gn")(x, lvl)
        return jax.nn.gelu(x, approximate=False)


def _mix_init(c: int):
    # matches torch xavier_uniform_ fans of the [C, C, 8] tensor
    fan = c * 8
    aa = math.sqrt(6.0 / (fan + fan))
    return lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -aa, aa)


class ChildDownsample(nn.Module):
    """Learned 8-children -> parent channel mix (`modules.py:382-398`).

    Weight layout is the natural child-major [8C, C]; the checkpoint
    converter un-scrambles the reference's flatten order."""

    channels: int

    @nn.compact
    def __call__(self, x8):  # [N8, C] sibling-major
        c = self.channels
        w = self.param("weights", _mix_init(c), (8 * c, c))
        return jnp.dot(
            x8.reshape(-1, 8 * c), w.astype(x8.dtype),
            preferred_element_type=x8.dtype,
        )


class ChildUpsample(nn.Module):
    """Learned parent -> 8-children mix (`modules.py:430-446`)."""

    channels: int

    @nn.compact
    def __call__(self, x):  # [N, C] -> [8N, C]
        c = self.channels
        w = self.param("weights", _mix_init(c), (c, 8 * c))
        out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
        return out.reshape(-1, c)


class GraphDownsampleVAE(nn.Module):
    """Level d -> d-1 (VAE flavour: mix + optional 1x1GnGelu,
    `dualoctree_networks/modules.py:39-64`)."""

    channels_in: int
    channels_out: int

    @nn.compact
    def __call__(self, x, g: DualGraph, d: int):
        cur = graph_ops._cur_segment(x, g, d)
        parents = ChildDownsample(self.channels_in, name="downsample")(cur)
        out = graph_ops.downsample_splice(x, parents, g, d)
        if self.channels_in != self.channels_out:
            out = Conv1x1GnGelu(
                self.channels_in, self.channels_out, name="conv1x1"
            )(out, g.level(d - 1))
        return out


class GraphUpsampleVAE(nn.Module):
    """Level d-1 -> d (VAE flavour, `dualoctree_networks/modules.py:71-91`)."""

    channels_in: int
    channels_out: int

    @nn.compact
    def __call__(self, x, g: DualGraph, d: int):
        up = ChildUpsample(self.channels_in, name="upsample")
        out = graph_ops.upsample_splice(x, g, d, up)
        if self.channels_in != self.channels_out:
            out = Conv1x1GnGelu(
                self.channels_in, self.channels_out, name="conv1x1"
            )(out, g.level(d))
        return out


class GraphDownsampleDiff(nn.Module):
    """Diffusion flavour: mix + GraphConv at the coarser level
    (`modules.py:400-428`)."""

    channels_in: int
    channels_out: int
    n_node_type: int = 0

    @nn.compact
    def __call__(self, x, g: DualGraph, d: int):
        cur = graph_ops._cur_segment(x, g, d)
        parents = ChildDownsample(self.channels_in, name="downsample")(cur)
        out = graph_ops.downsample_splice(x, parents, g, d)
        out = GraphConv(
            self.channels_in, self.channels_out,
            n_node_type=self.n_node_type, name="conv",
        )(out, g.level(d - 1))
        return out


class GraphUpsampleDiff(nn.Module):
    """Diffusion flavour: mix + GraphConv at the finer level
    (`modules.py:449-472`)."""

    channels_in: int
    channels_out: int
    n_node_type: int = 0

    @nn.compact
    def __call__(self, x, g: DualGraph, d: int):
        up = ChildUpsample(self.channels_in, name="upsample")
        out = graph_ops.upsample_splice(x, g, d, up)
        out = GraphConv(
            self.channels_in, self.channels_out,
            n_node_type=self.n_node_type, name="conv",
        )(out, g.level(d))
        return out


class GraphResBlock(nn.Module):
    """GN -> swish -> conv -> GN -> swish -> dropout -> conv (+1x1Gn skip)
    (`modules.py:593-641`), rematerialised like the reference's
    ckpt_conv_wrapper."""

    channel_in: int
    channel_out: int
    dropout: float = 0.0
    n_node_type: int = 0
    use_checkpoint: bool = True
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x, lvl: GraphLevel, deterministic: bool = True):
        def body(mdl, x):
            h = DualOctreeGroupNorm(mdl.channel_in, name="norm1")(x, lvl)
            h = swish(h)
            h = GraphConv(
                mdl.channel_in, mdl.channel_out,
                n_node_type=mdl.n_node_type, name="conv1",
            )(h, lvl)
            h = checkpoint_name(h, "graph_conv")
            h = DualOctreeGroupNorm(mdl.channel_out, name="norm2")(h, lvl)
            h = swish(h)
            if mdl.dropout > 0:
                h = nn.Dropout(mdl.dropout, deterministic=deterministic)(h)
            h = GraphConv(
                mdl.channel_out, mdl.channel_out,
                n_node_type=mdl.n_node_type, name="conv2",
            )(h, lvl)
            h = checkpoint_name(h, "graph_conv")
            if mdl.channel_in != mdl.channel_out:
                x = Conv1x1Gn(mdl.channel_in, mdl.channel_out, name="conv1x1c")(
                    x, lvl
                )
                x = checkpoint_name(x, "graph_conv")
            return h + x

        wrap = remat_transform(self.remat_policy) if self.use_checkpoint \
            else None
        if wrap is not None:
            body = wrap(body)
        return body(self, x)


class GraphResBlocks(nn.Module):
    channel_in: int
    channel_out: int
    resblk_num: int
    dropout: float = 0.0
    n_node_type: int = 0
    use_checkpoint: bool = True
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x, lvl: GraphLevel, deterministic: bool = True):
        channels = [self.channel_in] + [self.channel_out] * self.resblk_num
        for i in range(self.resblk_num):
            x = GraphResBlock(
                channels[i], channels[i + 1], self.dropout,
                self.n_node_type, self.use_checkpoint, self.remat_policy,
                name=f"resblks_{i}",
            )(x, lvl, deterministic)
        return x


class GraphResBlockEmbed(nn.Module):
    """Timestep/label-conditioned graph residual block
    (`modules.py:661-763`); the per-sample embedding loop becomes a batched
    gather-add."""

    channels: int
    emb_channels: int
    out_channels: int
    dropout: float = 0.0
    n_node_type: int = 0
    use_checkpoint: bool = True
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x, emb, lvl: GraphLevel, deterministic: bool = True):
        def body(mdl, x, emb):
            h = DualOctreeGroupNorm(mdl.channels, name="block1_norm")(x, lvl)
            h = swish(h)
            h = GraphConv(
                mdl.channels, mdl.out_channels,
                n_node_type=mdl.n_node_type, name="conv1",
            )(h, lvl)
            h = checkpoint_name(h, "graph_conv")
            e = nn.Dense(mdl.out_channels, name="emb_layers")(swish(emb))
            h = graph_ops.add_batch_embedding(h, e.astype(h.dtype), lvl)
            h = DualOctreeGroupNorm(mdl.out_channels, name="block2_norm")(h, lvl)
            h = swish(h)
            if mdl.dropout > 0:
                h = nn.Dropout(mdl.dropout, deterministic=deterministic)(h)
            h = GraphConv(
                mdl.out_channels, mdl.out_channels,
                n_node_type=mdl.n_node_type, zero_init=True, name="conv2",
            )(h, lvl)
            h = checkpoint_name(h, "graph_conv")
            if mdl.out_channels == mdl.channels:
                skip = x
            else:
                skip = Conv1x1(
                    mdl.channels, mdl.out_channels, name="skip_connection"
                )(x)
                skip = checkpoint_name(skip, "graph_conv")
            return skip + h

        wrap = remat_transform(self.remat_policy) if self.use_checkpoint \
            else None
        if wrap is not None:
            body = wrap(body)
        return body(self, x, emb)


# ----------------------------------------------------------------------
# time embeddings
# ----------------------------------------------------------------------
class LearnedSinusoidalPosEmb(nn.Module):
    """[x, sin(2π w x), cos(2π w x)] with learned frequencies
    (`modules.py:550-563`)."""

    dim: int

    @nn.compact
    def __call__(self, t):  # [B]
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,))
        f = t[:, None] * w[None, :] * (2 * math.pi)
        return jnp.concatenate([t[:, None], jnp.sin(f), jnp.cos(f)], axis=-1)


def timestep_embedding(t, dim, max_period=10000.0):
    """Fixed sinusoidal embedding (`ldm_diffusion_util.py:171-191`)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


# ----------------------------------------------------------------------
# dense 3D modules (lr U-Net); NDHWC layout, TPU-native
# ----------------------------------------------------------------------
class ConvNd(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.zero_init else (
            nn.initializers.lecun_normal()
        )
        # torch-style symmetric padding=k//2: XLA "SAME" would pad (0, 1)
        # for stride 2 / kernel 3, shifting every window by one voxel vs
        # the reference's ConvDownsample (`modules.py:63-77`, padding=1).
        pad = self.kernel // 2
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel,) * 3,
            strides=(self.stride,) * 3,
            padding=((pad, pad),) * 3,
            kernel_init=init,
            bias_init=nn.initializers.zeros,
            name="conv",
        )(x)


class VoxelGroupNorm(nn.Module):
    """GroupNorm32 over NDHWC voxels (`modules.py:26-36`), fp32 stats."""

    channels: int

    @nn.compact
    def __call__(self, x):
        g = min(32, self.channels)
        return nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=jnp.float32)(
            x
        ).astype(x.dtype)


class ResnetBlock3D(nn.Module):
    """Dense resnet block with time-emb shift (`modules.py:474-513`,
    use_text_condition=False path)."""

    dim_in: int
    dim_out: int
    emb_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = VoxelGroupNorm(self.dim_in, name="norm1")(x)
        h = swish(h)
        h = ConvNd(self.dim_out, name="conv1")(h)
        e = nn.Dense(self.dim_out, name="time_mlp")(swish(emb))
        h = h + e[:, None, None, None, :].astype(h.dtype)
        h = VoxelGroupNorm(self.dim_out, name="norm2")(h)
        h = swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = ConvNd(self.dim_out, zero_init=True, name="conv2")(h)
        if self.dim_in != self.dim_out:
            x = ConvNd(self.dim_out, kernel=1, name="res_conv")(x)
        return h + x


class AttentionBlock3D(nn.Module):
    """Voxel self-attention (`modules.py:515-547`): flatten spatial dims,
    single QKV projection, softmax in fp32."""

    channels: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        n = d * h * w
        xf = x.reshape(b, n, c)
        y = VoxelGroupNorm(self.channels, name="norm")(xf.reshape(b, 1, 1, n, c))
        y = y.reshape(b, n, c)
        qkv = nn.Dense(3 * c, name="qkv")(y)
        qkv = qkv.reshape(b, n, self.num_heads, 3 * (c // self.num_heads))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / math.sqrt(math.sqrt(c // self.num_heads))
        att = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k * scale)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, n, c)
        out = nn.Dense(
            c, name="proj_out", kernel_init=nn.initializers.zeros
        )(out)
        return (xf + out).reshape(b, d, h, w, c)


class ConvDownsample3D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return ConvNd(self.channels, stride=2, name="op")(x)


class ConvUpsample3D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * d, 2 * h, 2 * w, c), "nearest")
        return ConvNd(self.channels, name="conv")(x)
