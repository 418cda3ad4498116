"""Torch oracles: reference-math lr/hr U-Net forwards for converter parity.

Whole-network counterparts of ``torch_ref_vae.py`` implementing, in plain
torch, the exact formulas of the reference diffusion networks (citations
into /root/reference):

* lr voxel U-Net ``UNet3DModel.forward`` / ``forward_as_middle``
  (`models/networks/diffusion_networks/graph_unet_lr.py:175-230`):
  LearnedSinusoidalPosEmb (`modules.py:550-563`), ResnetBlock
  (`modules.py:474-513`, use_text_condition=False path), AttentionBlock +
  QKVAttention legacy head split (`modules.py:515-547`),
  ConvDownsample/ConvUpsample (`modules.py:63-95`);
* hr graph U-Net ``UNet3DModel.forward``
  (`graph_unet_hr.py:214-281`): GraphResBlockEmbed (`modules.py:661-763`),
  diffusion-flavour GraphDownsample/GraphUpsample with the trailing
  GraphConv (`modules.py:400-472`), fixed sinusoidal timestep embedding
  (`ldm_diffusion_util.py:171-191`), the frozen-lr middle block wiring
  (`graph_unet_hr.py:257-262`).

Graph ops (scatter-mean conv, dual group norm) are reused from
``torch_ref_vae``; state dicts use the reference's exact key layout so the
same dict drives both the oracle and ``utils/torch_convert``.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

import torch_ref_vae as tref


# ----------------------------------------------------------------------
# shared pieces
# ----------------------------------------------------------------------
def silu(x):
    return F.silu(x)


def timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period)
        * torch.arange(half, dtype=torch.float32) / half
    )
    args = t[:, None].float() * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    if dim % 2:
        emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
    return emb


def _lin(sd, p, x):
    return F.linear(x, sd[p + ".weight"], sd.get(p + ".bias"))


def _gn(sd, p, x, channels):
    return F.group_norm(x, min(32, channels), sd[p + ".weight"],
                        sd[p + ".bias"], eps=1e-5)


# ----------------------------------------------------------------------
# lr voxel U-Net oracle (NCDHW)
# ----------------------------------------------------------------------
def _resnet3d(sd, p, x, emb):
    cin = x.shape[1]
    h = _gn(sd, p + ".block1.0", x, cin)
    h = silu(h)
    h = F.conv3d(x=h, weight=sd[p + ".block1.2.weight"],
                 bias=sd[p + ".block1.2.bias"], padding=1)
    e = _lin(sd, p + ".time_mlp.1", silu(emb))
    h = h + e[:, :, None, None, None]
    cout = h.shape[1]
    h = _gn(sd, p + ".block2.0", h, cout)
    h = silu(h)
    h = F.conv3d(x=h, weight=sd[p + ".block2.3.weight"],
                 bias=sd[p + ".block2.3.bias"], padding=1)
    if p + ".res_conv.weight" in sd:
        x = F.conv3d(x=x, weight=sd[p + ".res_conv.weight"],
                     bias=sd[p + ".res_conv.bias"])
    return h + x


def _attention(sd, p_norm, p_attn, x, num_heads):
    """Sequential(convnormalization, SiLU, AttentionBlock)
    (`graph_unet_lr.py:128-134`)."""
    c = x.shape[1]
    x = silu(_gn(sd, p_norm, x, c))
    b, c, *spatial = x.shape
    xf = x.reshape(b, c, -1)
    h = _gn(sd, p_attn + ".norm", xf, c)
    qkv = F.conv1d(h, sd[p_attn + ".qkv.weight"], sd[p_attn + ".qkv.bias"])
    qkv = qkv.reshape(b * num_heads, -1, qkv.shape[2])
    ch = qkv.shape[1] // 3
    q, k, v = torch.split(qkv, ch, dim=1)
    scale = 1 / math.sqrt(math.sqrt(ch))
    w = torch.einsum("bct,bcs->bts", q * scale, k * scale)
    w = torch.softmax(w, dim=-1)
    h = torch.einsum("bts,bcs->bct", w, v)
    h = h.reshape(b, -1, h.shape[-1])
    h = F.conv1d(h, sd[p_attn + ".proj_out.weight"],
                 sd[p_attn + ".proj_out.bias"])
    return (xf + h).reshape(b, c, *spatial)


def lr_forward(sd, x, t, cfg, label=None, x_self_cond=None, as_middle=False):
    """`graph_unet_lr.py:186-230`; x is NCDHW."""
    mc = cfg["model_channels"]
    mult = cfg["channel_mult"]
    attn_res = cfg["attention_resolutions"]
    heads = cfg["num_heads"]
    if not as_middle:
        if x_self_cond is None:
            x_self_cond = torch.zeros_like(x)
        x = torch.cat([x, x_self_cond], dim=1)
        x = F.conv3d(x=x, weight=sd["input_emb.weight"],
                     bias=sd["input_emb.bias"], padding=1)

    # LearnedSinusoidalPosEmb -> MLP (`graph_unet_lr.py:104-111,207`)
    w = sd["time_pos_emb.weights"]
    f = t[:, None] * w[None] * 2 * math.pi
    pe = torch.cat([t[:, None], torch.sin(f), torch.cos(f)], dim=-1)
    emb = _lin(sd, "time_emb.2", silu(_lin(sd, "time_emb.0", pe)))
    if label is not None:
        emb = emb + sd["label_emb.weight"][label]

    num_res = len(mult)
    hs = []
    ds = 1
    for ind in range(num_res):
        x = _resnet3d(sd, f"downs.{ind}.0", x, emb)
        if ds in attn_res:
            x = _attention(sd, f"downs.{ind}.1.0", f"downs.{ind}.1.2", x,
                           heads)
        hs.append(x)
        if ind < num_res - 1:
            x = F.conv3d(x=x, weight=sd[f"downs.{ind}.2.op.weight"],
                         bias=sd[f"downs.{ind}.2.op.bias"], stride=2,
                         padding=1)
            ds *= 2

    x = _resnet3d(sd, "mid_block1", x, emb)
    if ds in attn_res:
        x = _attention(sd, "mid_self_attn.0", "mid_self_attn.2", x, heads)
    x = _resnet3d(sd, "mid_block2", x, emb)

    # NOTE: in the reference's ups constructor `is_last = ind >=
    # num_resolutions - 1` is never true (ind stops at num_res - 2), so
    # EVERY ups entry carries a ConvUpsample (`graph_unet_lr.py:152-166`)
    for ind in range(num_res - 1):
        x = torch.cat([x, hs.pop()], dim=1)
        x = _resnet3d(sd, f"ups.{ind}.0", x, emb)
        if ds in attn_res:
            x = _attention(sd, f"ups.{ind}.1.0", f"ups.{ind}.1.2", x, heads)
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = F.conv3d(x=x, weight=sd[f"ups.{ind}.2.conv.weight"],
                     bias=sd[f"ups.{ind}.2.conv.bias"], padding=1)
        ds //= 2

    x = silu(_gn(sd, "end.0", x, mc))
    if as_middle:
        return x
    return F.conv3d(x=x, weight=sd["out.weight"], bias=sd["out.bias"],
                    padding=1)


def lr_forward_as_middle(sd, h, xyzb, S, t, cfg, label=None):
    """`graph_unet_lr.py:175-182`: voxelise full-depth node features, run
    the body, gather back at node coordinates."""
    x, y, z, b = xyzb
    B = int(b.max()) + 1
    c = h.shape[1]
    grid = torch.zeros(B, S, S, S, c, dtype=h.dtype)
    grid[b, x, y, z] = h
    grid = grid.permute(0, 4, 1, 2, 3).contiguous()
    grid = lr_forward(sd, grid, t, cfg, label=label, as_middle=True)
    grid = grid.permute(0, 2, 3, 4, 1).contiguous()
    return grid[b, x, y, z, :]


def lr_make_state_dict(rng, cfg, num_classes=None, in_channels=8,
                       out_channels=8):
    """Random reference-layout state dict for the lr U-Net
    (`graph_unet_lr.py:100-178` module tree)."""
    mc = cfg["model_channels"]
    mult = cfg["channel_mult"]
    attn_res = cfg["attention_resolutions"]
    ted = mc * 4
    sd = {}

    def t(*shape, scale=0.2):
        return torch.tensor((rng.normal(size=shape) * scale).astype(np.float32))

    def lin(p, i, o):
        sd[p + ".weight"] = t(o, i)
        sd[p + ".bias"] = t(o)

    def conv3(p, i, o):
        sd[p + ".weight"] = t(o, i, 3, 3, 3)
        sd[p + ".bias"] = t(o)

    def gn(p, c):
        sd[p + ".weight"] = t(c, scale=0.5) + 1.0
        sd[p + ".bias"] = t(c)

    def resnet(p, i, o):
        gn(p + ".block1.0", i)
        conv3(p + ".block1.2", i, o)
        lin(p + ".time_mlp.1", ted, o)
        gn(p + ".block2.0", o)
        conv3(p + ".block2.3", o, o)
        if i != o:
            sd[p + ".res_conv.weight"] = t(o, i, 1, 1, 1)
            sd[p + ".res_conv.bias"] = t(o)

    def attn(p_norm, p_attn, c):
        gn(p_norm, c)
        gn(p_attn + ".norm", c)
        sd[p_attn + ".qkv.weight"] = t(3 * c, c, 1)
        sd[p_attn + ".qkv.bias"] = t(3 * c)
        sd[p_attn + ".proj_out.weight"] = t(c, c, 1)
        sd[p_attn + ".proj_out.bias"] = t(c)

    sd["time_pos_emb.weights"] = t(mc // 2, scale=1.0)
    lin("time_emb.0", mc + 1, ted)
    lin("time_emb.2", ted, ted)
    if num_classes is not None:
        sd["label_emb.weight"] = t(num_classes, ted)
    conv3("input_emb", 2 * in_channels, mc)

    channels = [mc] + [mc * m for m in mult]
    in_out = list(zip(channels[:-1], channels[1:]))
    num_res = len(in_out)
    ds = 1
    for ind, (din, dout) in enumerate(in_out):
        resnet(f"downs.{ind}.0", din, dout)
        if ds in attn_res:
            attn(f"downs.{ind}.1.0", f"downs.{ind}.1.2", dout)
        if ind < num_res - 1:
            conv3(f"downs.{ind}.2.op", dout, dout)
            ds *= 2
    mid = channels[-1]
    resnet("mid_block1", mid, mid)
    if ds in attn_res:
        attn("mid_self_attn.0", "mid_self_attn.2", mid)
    resnet("mid_block2", mid, mid)
    for ind, (din, dout) in enumerate(reversed(in_out[1:])):
        resnet(f"ups.{ind}.0", dout * 2, din)
        if ds in attn_res:
            attn(f"ups.{ind}.1.0", f"ups.{ind}.1.2", din)
        conv3(f"ups.{ind}.2.conv", din, din)
        ds //= 2
    gn("end.0", mc)
    conv3("out", mc, out_channels)
    return sd


# ----------------------------------------------------------------------
# hr graph U-Net oracle
# ----------------------------------------------------------------------
def _resblock_embed(sd, p, x, emb, gr, n_node_type):
    """GraphResBlockEmbed._forward (`modules.py:735-763`)."""
    cin = x.shape[1]
    h = tref.group_norm(x, sd[p + ".block1_norm.weights"],
                        sd[p + ".block1_norm.bias"], gr, cin)
    h = silu(h)
    h = tref.graph_conv(h, sd[p + ".conv1.weights"], gr, n_node_type)
    cout = h.shape[1]
    emb_out = _lin(sd, p + ".emb_layers.1", silu(emb))
    h = h + emb_out[gr["batch_id"]]
    h = tref.group_norm(h, sd[p + ".block2_norm.weights"],
                        sd[p + ".block2_norm.bias"], gr, cout)
    h = silu(h)
    h = tref.graph_conv(h, sd[p + ".conv2.weights"], gr, n_node_type)
    if p + ".skip_connection.linear.weight" in sd:
        x = x @ sd[p + ".skip_connection.linear.weight"].T
    return x + h


def _graph_downsample(sd, p, x, graphs, octree, d):
    """Diffusion GraphDownsample d -> d-1 (`modules.py:400-428`)."""
    nnum = octree["nnum"]
    numd = nnum[d]
    child_prev = octree["lnum_child"][d - 1][: nnum[d - 1]]
    leaf_mask = torch.tensor(np.asarray(child_prev) < 0)
    lnumd = int(leaf_mask.sum())
    outd = tref.down_mix(x[-numd:], sd[p + ".downsample.weights"])
    out = torch.zeros(leaf_mask.shape[0], x.shape[1], dtype=x.dtype)
    out[leaf_mask] = x[-lnumd - numd:-numd]
    out[~leaf_mask] = outd
    out = torch.cat([x[:-numd - lnumd], out], dim=0)
    return tref.graph_conv(out, sd[p + ".conv.weights"], graphs[d - 1],
                           (d - 1) - 1)


def _graph_upsample(sd, p, x, graphs, octree, d):
    """Diffusion GraphUpsample d -> d+1 (`modules.py:449-472`)."""
    nnum = octree["nnum"]
    numd = nnum[d]
    child_d = octree["lnum_child"][d][:numd]
    leaf_mask = torch.tensor(np.asarray(child_d) < 0)
    outd = x[-numd:]
    out1 = tref.up_mix(outd[~leaf_mask], sd[p + ".upsample.weights"])
    out = torch.cat([x[:-numd], outd[leaf_mask], out1], dim=0)
    return tref.graph_conv(out, sd[p + ".conv.weights"], graphs[d + 1],
                           (d + 1) - 1)


def hr_forward(sd, x, graphs, octree, t, cfg, label=None, lr_sd=None,
               lr_cfg=None, lr_xyzb=None):
    """`graph_unet_hr.py:214-281`; graphs = {d: compact_level}, octree from
    ``torch_ref_vae.octree_meta``."""
    mc = cfg["model_channels"]
    mult = cfg["channel_mult"]
    nrb = cfg["num_res_blocks"]
    input_depth = cfg["input_depth"]
    full_depth = cfg["full_depth"]

    t_emb = timestep_embedding(t, mc)
    emb = _lin(sd, "time_embed.2", silu(_lin(sd, "time_embed.0", t_emb)))
    if label is not None:
        emb = emb + sd["label_emb.weight"][label]

    d = input_depth
    h = tref.graph_conv(x, sd["input_blocks.0.weights"], graphs[d], d - 1)
    hs = [h]
    k = 1
    for level in range(len(mult)):
        for _ in range(nrb[level]):
            h = _resblock_embed(sd, f"input_blocks.{k}", h, emb, graphs[d],
                                d - 1)
            hs.append(h)
            k += 1
        if level != len(mult) - 1:
            h = _graph_downsample(sd, f"input_blocks.{k}", h, graphs, octree,
                                  d)
            d -= 1
            hs.append(h)
            k += 1

    if lr_sd is not None:
        h = _resblock_embed(sd, "middle_block1", h, emb, graphs[d], d - 1)
        h_lr = lr_forward_as_middle(lr_sd, h, lr_xyzb, 2 ** full_depth, t,
                                    lr_cfg, label=label)
        h = torch.cat([h, h_lr], dim=1)
        h = _resblock_embed(sd, "middle_block2", h, emb, graphs[d], d - 1)

    k = 0
    for level in list(range(len(mult)))[::-1]:
        for i in range(nrb[level] + 1):
            h = torch.cat([h, hs.pop()], dim=1)
            h = _resblock_embed(sd, f"output_blocks.{k}", h, emb, graphs[d],
                                d - 1)
            k += 1
            if level and i == nrb[level]:
                h = _graph_upsample(sd, f"output_blocks.{k}", h, graphs,
                                    octree, d)
                d += 1
                k += 1

    h = tref.group_norm(h, sd["end_norm.weights"], sd["end_norm.bias"],
                        graphs[d], h.shape[1])
    h = silu(h)
    return tref.graph_conv(h, sd["out.weights"], graphs[d],
                           cfg["input_depth"] - 1)


def hr_make_state_dict(rng, cfg, num_classes=None, in_channels=3,
                       out_channels=3, lr_model_channels=8):
    """Random reference-layout state dict for the hr U-Net
    (`graph_unet_hr.py:104-211` module tree)."""
    mc = cfg["model_channels"]
    mult = cfg["channel_mult"]
    nrb = cfg["num_res_blocks"]
    input_depth = cfg["input_depth"]
    ted = mc * 4
    sd = {}

    def t(*shape, scale=0.2):
        return torch.tensor((rng.normal(size=shape) * scale).astype(np.float32))

    def lin(p, i, o):
        sd[p + ".weight"] = t(o, i)
        sd[p + ".bias"] = t(o)

    def gn(p, c):
        sd[p + ".weights"] = t(1, c, scale=0.5) + 1.0
        sd[p + ".bias"] = t(1, c)

    def gconv(p, cin, cout, nt):
        node_ch = nt if nt > 1 else 0
        sd[p + ".weights"] = t(7 * (cin + node_ch), cout)

    def resblk(p, cin, cout, nt):
        gn(p + ".block1_norm", cin)
        gconv(p + ".conv1", cin, cout, nt)
        lin(p + ".emb_layers.1", ted, cout)
        gn(p + ".block2_norm", cout)
        gconv(p + ".conv2", cout, cout, nt)
        if cin != cout:
            sd[p + ".skip_connection.linear.weight"] = t(cout, cin)

    lin("time_embed.0", mc, ted)
    lin("time_embed.2", ted, ted)
    if num_classes is not None:
        sd["label_emb.weight"] = t(num_classes, ted)

    d = input_depth
    gconv("input_blocks.0", in_channels, mc, d - 1)
    chans = [mc]
    ch = mc
    k = 1
    for level, m in enumerate(mult):
        for _ in range(nrb[level]):
            resblk(f"input_blocks.{k}", ch, m * mc, d - 1)
            ch = m * mc
            chans.append(ch)
            k += 1
        if level != len(mult) - 1:
            d -= 1
            sd[f"input_blocks.{k}.downsample.weights"] = t(ch, ch, 8)
            gconv(f"input_blocks.{k}.conv", ch, ch, d - 1)
            chans.append(ch)
            k += 1
    resblk("middle_block1", ch, lr_model_channels, d - 1)
    resblk("middle_block2", lr_model_channels * 2, ch, d - 1)
    k = 0
    for level, m in list(enumerate(mult))[::-1]:
        for i in range(nrb[level] + 1):
            ich = chans.pop()
            resblk(f"output_blocks.{k}", ch + ich, mc * m, d - 1)
            ch = mc * m
            k += 1
            if level and i == nrb[level]:
                d += 1
                sd[f"output_blocks.{k}.upsample.weights"] = t(ch, ch, 8)
                gconv(f"output_blocks.{k}.conv", ch, ch, d - 1)
                k += 1
    gn("end_norm", ch)
    gconv("out", ch, out_channels, input_depth - 1)
    return sd
