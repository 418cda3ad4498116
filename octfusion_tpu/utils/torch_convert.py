"""PyTorch .pth -> flax params conversion for the reference's published
checkpoints (SURVEY.md §5.4: ``vae-shapenet-depth-8.pth``,
``df_steps-{split,union}.pth``).

Operates on plain state dicts (str -> numpy).  Layout conversions:

* ``Linear.weight`` [O, I] -> ``kernel`` [I, O];
* ``Conv3d.weight`` [O, I, D, H, W] -> [D, H, W, I, O] (NDHWC);
* ``Conv1d.weight`` [O, I, 1] -> Dense kernel [I, O];
* graph-norm ``weights``/``bias`` [1, C] -> [C];
* the child-mix tensors [C, C, 8] are un-scrambled into the natural
  child-major layouts used by ``ChildDownsample``/``ChildUpsample``
  (see nn/modules.py — the reference's ``flatten(1)`` mixes (channel, child)
  pairs; Down: M[q, a] = W[a, q//8, q%8], Up: M[a, p] = W[a, p//8, p%8]).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _np(t):
    try:
        import torch

        if isinstance(t, torch.Tensor):
            return t.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def load_torch_file(path: str) -> Dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(sd, prefix, tree, out_path, bias=True):
    _set(tree, out_path + ("kernel",), _np(sd[prefix + ".weight"]).T)
    if bias and prefix + ".bias" in sd:
        _set(tree, out_path + ("bias",), _np(sd[prefix + ".bias"]))


def _gn_graph(sd, prefix, tree, out_path):
    _set(tree, out_path + ("weights",), _np(sd[prefix + ".weights"]).reshape(-1))
    _set(tree, out_path + ("bias",), _np(sd[prefix + ".bias"]).reshape(-1))


def _gn_voxel(sd, prefix, tree, out_path):
    _set(tree, out_path + ("scale",), _np(sd[prefix + ".weight"]))
    _set(tree, out_path + ("bias",), _np(sd[prefix + ".bias"]))


def _graph_conv(sd, prefix, tree, out_path):
    _set(tree, out_path + ("weights",), _np(sd[prefix + ".weights"]))
    if prefix + ".bias" in sd:
        _set(tree, out_path + ("bias",), _np(sd[prefix + ".bias"]))


def _conv3d(sd, prefix, tree, out_path):
    w = _np(sd[prefix + ".weight"])  # [O, I, D, H, W]
    _set(tree, out_path + ("kernel",), np.transpose(w, (2, 3, 4, 1, 0)))
    if prefix + ".bias" in sd:
        _set(tree, out_path + ("bias",), _np(sd[prefix + ".bias"]))


def _conv1d_as_dense(sd, prefix, tree, out_path):
    w = _np(sd[prefix + ".weight"])[..., 0]  # [O, I]
    _set(tree, out_path + ("kernel",), w.T)
    if prefix + ".bias" in sd:
        _set(tree, out_path + ("bias",), _np(sd[prefix + ".bias"]))


def _down_mix(sd, prefix, tree, out_path):
    w = _np(sd[prefix + ".weights"])  # [C, C, 8]
    c = w.shape[0]
    q = np.arange(8 * c)
    m = w[:, q // 8, q % 8].T  # M[q, a] = W[a, q//8, q%8]
    _set(tree, out_path + ("weights",), m)


def _up_mix(sd, prefix, tree, out_path):
    w = _np(sd[prefix + ".weights"])  # [C, C, 8]
    c = w.shape[0]
    p = np.arange(8 * c)
    m = w[:, p // 8, p % 8]  # M[a, p] = W[a, p//8, p%8]
    _set(tree, out_path + ("weights",), m)


def _conv1x1(sd, prefix, tree, out_path):
    _linear(sd, prefix + ".linear", tree, out_path + ("linear",))


def _conv1x1gn(sd, prefix, tree, out_path):
    _conv1x1(sd, prefix + ".conv", tree, out_path + ("conv",))
    _gn_graph(sd, prefix + ".gn", tree, out_path + ("gn",))


def _graph_resblock(sd, prefix, tree, out_path):
    _gn_graph(sd, prefix + ".norm1", tree, out_path + ("norm1",))
    _graph_conv(sd, prefix + ".conv1", tree, out_path + ("conv1",))
    _gn_graph(sd, prefix + ".norm2", tree, out_path + ("norm2",))
    _graph_conv(sd, prefix + ".conv2", tree, out_path + ("conv2",))
    if prefix + ".conv1x1c.conv.linear.weight" in sd:
        _conv1x1gn(sd, prefix + ".conv1x1c", tree, out_path + ("conv1x1c",))


def _graph_resblocks(sd, prefix, tree, out_path, n):
    for j in range(n):
        _graph_resblock(
            sd, f"{prefix}.resblks.{j}", tree, out_path + (f"resblks_{j}",)
        )


def _graph_resblock_embed(sd, prefix, tree, out_path):
    _gn_graph(sd, prefix + ".block1_norm", tree, out_path + ("block1_norm",))
    _graph_conv(sd, prefix + ".conv1", tree, out_path + ("conv1",))
    _linear(sd, prefix + ".emb_layers.1", tree, out_path + ("emb_layers",))
    _gn_graph(sd, prefix + ".block2_norm", tree, out_path + ("block2_norm",))
    _graph_conv(sd, prefix + ".conv2", tree, out_path + ("conv2",))
    if prefix + ".skip_connection.linear.weight" in sd:
        _conv1x1(sd, prefix + ".skip_connection", tree,
                 out_path + ("skip_connection",))


def _predict_head(sd, prefix, tree, out_path):
    # Sequential(Conv1x1GnGeluSequential, Conv1x1) (`graph_vae.py:127-130`)
    _conv1x1(sd, prefix + ".0.conv", tree, out_path + ("head0", "conv"))
    _gn_graph(sd, prefix + ".0.gn", tree, out_path + ("head0", "gn"))
    _linear(sd, prefix + ".1.linear", tree, out_path + ("head1", "linear"))


def convert_vae(sd: Dict, depth=8, depth_stop=6, depth_out=8,
                resblk_num=2) -> Dict:
    """Reference ``GraphVAE.state_dict()`` -> flax params['params'] tree."""
    sd = {k: v for k, v in sd.items()}
    t: Dict = {}
    _graph_conv(sd, "conv1", t, ("conv1",))
    n_enc = depth - depth_stop + 1
    for i in range(n_enc):
        _graph_resblocks(sd, f"encoder.{i}", t, (f"encoder_{i}",),
                         resblk_num - 1)
    for i in range(depth - depth_stop):
        _down_mix(sd, f"downsample.{i}.downsample", t,
                  (f"downsample_{i}", "downsample"))
        if f"downsample.{i}.conv1x1.conv.linear.weight" in sd:
            _conv1x1(sd, f"downsample.{i}.conv1x1.conv", t,
                     (f"downsample_{i}", "conv1x1", "conv"))
            _gn_graph(sd, f"downsample.{i}.conv1x1.gn", t,
                      (f"downsample_{i}", "conv1x1", "gn"))
    _gn_graph(sd, "encoder_norm_out", t, ("encoder_norm_out",))
    _conv1x1(sd, "KL_conv", t, ("KL_conv",))
    _conv1x1(sd, "post_KL_conv", t, ("post_KL_conv",))
    _graph_resblocks(sd, "decoder_mid.block_1", t, ("decoder_mid_block_1",),
                     resblk_num)
    _graph_resblocks(sd, "decoder_mid.block_2", t, ("decoder_mid_block_2",),
                     resblk_num)
    n_dec = depth_out - depth_stop + 1
    for i in range(n_dec):
        _graph_resblocks(sd, f"decoder.{i}", t, (f"decoder_{i}",), resblk_num)
        _predict_head(sd, f"predict.{i}", t, (f"predict_{i}",))
        _predict_head(sd, f"regress.{i}", t, (f"regress_{i}",))
    for i in range(depth_out - depth_stop):
        _up_mix(sd, f"upsample.{i}.upsample", t, (f"upsample_{i}", "upsample"))
        if f"upsample.{i}.conv1x1.conv.linear.weight" in sd:
            _conv1x1(sd, f"upsample.{i}.conv1x1.conv", t,
                     (f"upsample_{i}", "conv1x1", "conv"))
            _gn_graph(sd, f"upsample.{i}.conv1x1.gn", t,
                      (f"upsample_{i}", "conv1x1", "gn"))
    return {"params": t}


def _resnet3d(sd, prefix, tree, out_path):
    _gn_voxel(sd, prefix + ".block1.0", tree, out_path + ("norm1", "GroupNorm_0"))
    _conv3d(sd, prefix + ".block1.2", tree, out_path + ("conv1", "conv"))
    _linear(sd, prefix + ".time_mlp.1", tree, out_path + ("time_mlp",))
    _gn_voxel(sd, prefix + ".block2.0", tree, out_path + ("norm2", "GroupNorm_0"))
    _conv3d(sd, prefix + ".block2.3", tree, out_path + ("conv2", "conv"))
    if prefix + ".res_conv.weight" in sd:
        _conv3d(sd, prefix + ".res_conv", tree, out_path + ("res_conv", "conv"))


def _attention3d(sd, prefix, tree, out_path):
    _gn_voxel(sd, prefix + ".norm", tree, out_path + ("norm", "GroupNorm_0"))
    _conv1d_as_dense(sd, prefix + ".qkv", tree, out_path + ("qkv",))
    _conv1d_as_dense(sd, prefix + ".proj_out", tree, out_path + ("proj_out",))


def convert_unet_lr(sd: Dict, channel_mult=(1, 2, 4),
                    attention_resolutions=(2, 4)) -> Dict:
    """Reference lr ``UNet3DModel.state_dict()`` -> flax params tree (to be
    placed under params['unet_lr'])."""
    t: Dict = {}
    _set(t, ("time_pos_emb", "weights"), _np(sd["time_pos_emb.weights"]))
    _linear(sd, "time_emb.0", t, ("time_emb_1",))
    _linear(sd, "time_emb.2", t, ("time_emb_2",))
    if "label_emb.weight" in sd:
        _set(t, ("label_emb", "embedding"), _np(sd["label_emb.weight"]))
    _conv3d(sd, "input_emb", t, ("input_emb", "conv"))
    num_res = len(channel_mult)
    ds = 1
    for ind in range(num_res):
        _resnet3d(sd, f"downs.{ind}.0", t, (f"down_{ind}_res",))
        if ds in attention_resolutions:
            _gn_voxel(sd, f"downs.{ind}.1.0", t,
                      (f"down_{ind}_attnnorm", "GroupNorm_0"))
            _attention3d(sd, f"downs.{ind}.1.2", t, (f"down_{ind}_attn",))
        if ind < num_res - 1:
            _conv3d(sd, f"downs.{ind}.2.op", t, (f"down_{ind}_ds", "op", "conv"))
            ds *= 2
    _resnet3d(sd, "mid_block1", t, ("mid_block1",))
    if ds in attention_resolutions:
        _gn_voxel(sd, "mid_self_attn.0", t, ("mid_attnnorm", "GroupNorm_0"))
        _attention3d(sd, "mid_self_attn.2", t, ("mid_attn",))
    _resnet3d(sd, "mid_block2", t, ("mid_block2",))
    # every ups entry carries a ConvUpsample: the reference's `is_last`
    # check in the ups constructor can never fire (`graph_unet_lr.py:152-166`
    # — ind stops at num_res - 2, threshold is num_res - 1)
    for ind in range(num_res - 1):
        _resnet3d(sd, f"ups.{ind}.0", t, (f"up_{ind}_res",))
        if ds in attention_resolutions:
            _gn_voxel(sd, f"ups.{ind}.1.0", t,
                      (f"up_{ind}_attnnorm", "GroupNorm_0"))
            _attention3d(sd, f"ups.{ind}.1.2", t, (f"up_{ind}_attn",))
        _conv3d(sd, f"ups.{ind}.2.conv", t, (f"up_{ind}_us", "conv", "conv"))
        ds //= 2
    _gn_voxel(sd, "end.0", t, ("end_norm", "GroupNorm_0"))
    _conv3d(sd, "out", t, ("out", "conv"))
    return t


def convert_unet_hr(sd: Dict, channel_mult=(1, 2, 4),
                    num_res_blocks=(1, 1, 0)) -> Dict:
    """Reference hr graph ``UNet3DModel.state_dict()`` -> flax tree."""
    t: Dict = {}
    _linear(sd, "time_embed.0", t, ("time_embed_1",))
    _linear(sd, "time_embed.2", t, ("time_embed_2",))
    if "label_emb.weight" in sd:
        _set(t, ("label_emb", "embedding"), _np(sd["label_emb.weight"]))
    _graph_conv(sd, "input_blocks.0", t, ("input_conv",))
    bi = 0
    k = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks[level]):
            _graph_resblock_embed(sd, f"input_blocks.{k}", t, (f"input_{bi}",))
            bi += 1
            k += 1
        if level != len(channel_mult) - 1:
            _down_mix(sd, f"input_blocks.{k}.downsample", t,
                      (f"input_{bi}", "downsample"))
            _graph_conv(sd, f"input_blocks.{k}.conv", t, (f"input_{bi}", "conv"))
            bi += 1
            k += 1
    _graph_resblock_embed(sd, "middle_block1", t, ("middle_block1",))
    _graph_resblock_embed(sd, "middle_block2", t, ("middle_block2",))
    bo = 0
    k = 0
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks[level] + 1):
            _graph_resblock_embed(sd, f"output_blocks.{k}", t, (f"output_{bo}",))
            bo += 1
            k += 1
            if level and i == num_res_blocks[level]:
                _up_mix(sd, f"output_blocks.{k}.upsample", t,
                        (f"output_{bo}", "upsample"))
                _graph_conv(sd, f"output_blocks.{k}.conv", t,
                            (f"output_{bo}", "conv"))
                bo += 1
                k += 1
    _gn_graph(sd, "end_norm", t, ("end_norm",))
    _graph_conv(sd, "out", t, ("out",))
    return t


def convert_union_ckpt(ckpt: Dict, channel_mult_lr=(1, 2, 4),
                       attention_resolutions=(2, 4),
                       channel_mult_hr=(1, 2, 4),
                       num_res_blocks_hr=(1, 1, 0), ema: bool = True) -> Dict:
    """Full diffusion checkpoint (`octfusion_model_union.py:501-523` keys
    df_unet_lr / ema_df_unet_lr / df_unet_hr / ...) -> UNetUnion params."""
    prefix = "ema_df_" if ema else "df_"
    t: Dict = {}
    if prefix + "unet_lr" in ckpt:
        t["unet_lr"] = convert_unet_lr(
            ckpt[prefix + "unet_lr"], channel_mult_lr, attention_resolutions
        )
    if prefix + "unet_hr" in ckpt:
        t["unet_hr"] = convert_unet_hr(
            ckpt[prefix + "unet_hr"], channel_mult_hr, num_res_blocks_hr
        )
    return {"params": t}


def load_vae_checkpoint(path: str, **kw) -> Dict:
    raw = load_torch_file(path)
    sd = raw.get("autoencoder", raw)
    return convert_vae(sd, **kw)
