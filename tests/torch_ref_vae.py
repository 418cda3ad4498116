"""Torch oracle: reference-math GraphVAE forward for converter parity tests.

Implements, in plain torch/numpy, the exact formulas of the reference
network stack (citations into /root/reference):

* ``GraphConv.forward`` — scatter-mean column buffer + GEMM
  (`models/networks/modules.py:194-220`);
* ``DualOctreeGroupNorm.forward`` (`modules.py:291-326`);
* ``GraphResBlock._forward`` GN-swish-conv x2 (+1x1 skip)
  (`modules.py:593-641`);
* VAE-flavour ``GraphDownsample``/``GraphUpsample`` leaf-preserving splices
  (`dualoctree_networks/modules.py:39-95`) around the 8-child mixing GEMMs
  ``Downsample``/``Upsample`` (`modules.py:382-446`);
* ``GraphVAE.octree_encoder/octree_decoder`` wiring
  (`dualoctree_networks/graph_vae.py:135-223`).

The graph comes from the repo's own DualGraph, compacted to the
reference's unpadded layout so every edge/scale/ordering assumption is
cross-checked against the padded JAX formulation.
"""

from __future__ import annotations

import numpy as np
import torch


# ----------------------------------------------------------------------
# graph extraction: padded DualGraph level -> reference compact layout
# ----------------------------------------------------------------------
def compact_level(g, d):
    """Compact view of level d: node order [leaves fd..d-1, all depth-d],
    edges with compact indices, node types, batch ids, per-depth leaf/slot
    maps for splices."""
    import jax.numpy as jnp  # noqa: F401  (g fields are jax arrays)

    spec = g.spec
    fd = spec.full_depth
    lvl = g.level(d)
    gcap = lvl.g_cap
    mapping = np.full(gcap, -1, np.int64)
    pos = 0
    seg_slots = {}   # dd -> octree slot of each compact leaf (for reg maps)
    for dd in range(fd, d):
        off = spec.leaf_off(d, dd)
        n = int(g.lnum[dd])
        mapping[off:off + n] = pos + np.arange(n)
        seg_slots[dd] = np.asarray(g.leaf_pos[dd - fd])[:n]
        pos += n
    off = spec.cur_off(d)
    n = int(g.octree.nnum[d])
    mapping[off:off + n] = pos + np.arange(n)
    pos += n

    row = np.asarray(lvl.edge_row)
    col = np.asarray(lvl.edge_col)
    dirs = np.asarray(lvl.edge_dir)
    ok = row < gcap
    crow = mapping[row[ok]]
    ccol = mapping[col[ok]]
    assert (crow >= 0).all() and (ccol >= 0).all()
    ntype = np.asarray(lvl.node_type)
    nbatch = np.asarray(lvl.node_batch)
    order = np.argsort(mapping[mapping >= 0], kind="stable")
    valid_idx = np.nonzero(mapping >= 0)[0][order]
    return {
        "n": pos,
        "row": torch.tensor(crow), "col": torch.tensor(ccol),
        "dir": torch.tensor(dirs[ok].astype(np.int64)),
        "node_type": torch.tensor(ntype[valid_idx].astype(np.int64)),
        "batch_id": torch.tensor(nbatch[valid_idx].astype(np.int64)),
        "batch_size": spec.ospec.batch_size,
        "seg_slots": seg_slots,
        "mapping": mapping,
    }


def octree_meta(octree):
    return {
        "nnum": [int(x) for x in np.asarray(octree.nnum)],
        "lnum_child": [np.asarray(c) for c in octree.child],
    }


# ----------------------------------------------------------------------
# reference ops
# ----------------------------------------------------------------------
def scatter_mean(src, index, dim_size):
    out = torch.zeros(dim_size, src.shape[1], dtype=src.dtype)
    cnt = torch.zeros(dim_size, 1, dtype=src.dtype)
    out.index_add_(0, index, src)
    cnt.index_add_(0, index, torch.ones(src.shape[0], 1, dtype=src.dtype))
    return out / cnt.clamp(min=1.0)


def graph_conv(x, w, gr, n_node_type):
    if n_node_type > 1:
        oh = torch.nn.functional.one_hot(
            gr["node_type"], num_classes=n_node_type
        ).to(x.dtype)
        x = torch.cat([x, oh], dim=1)
    idx = gr["row"] * 7 + gr["dir"]
    col = scatter_mean(x[gr["col"]], idx, x.shape[0] * 7)
    return col.view(x.shape[0], -1) @ w


def group_norm(x, weights, bias, gr, channels):
    eps = 1e-5
    group = min(32, channels)
    if channels <= 32:
        group = channels // 4
    elif channels % group != 0:
        group = 30
    cpg = channels // group
    bid = gr["batch_id"]
    bsz = gr["batch_size"]

    def adj(t):
        if cpg > 1:
            t = t.reshape(-1, group, cpg).sum(-1, keepdim=True)
            t = t.repeat(1, 1, cpg).reshape(-1, channels)
        return t

    ones = torch.ones(x.shape[0], 1, dtype=x.dtype)
    count = torch.zeros(bsz, 1, dtype=x.dtype).index_add_(0, bid, ones)
    count = count * cpg
    inv_count = 1.0 / (count + eps)
    mean = torch.zeros(bsz, channels, dtype=x.dtype).index_add_(0, bid, x)
    mean = adj(mean * inv_count)
    out = x - mean.index_select(0, bid)
    var = torch.zeros(bsz, channels, dtype=x.dtype).index_add_(0, bid, out**2)
    var = adj(var * inv_count)
    inv_std = 1.0 / (var + eps).sqrt()
    out = out * inv_std.index_select(0, bid)
    return out * weights + bias


def swish(x):
    return x * torch.sigmoid(x)


def resblock(x, sd, p, gr, channels, n_node_type):
    h = group_norm(x, sd[p + ".norm1.weights"], sd[p + ".norm1.bias"], gr,
                   channels)
    h = swish(h)
    h = graph_conv(h, sd[p + ".conv1.weights"], gr, n_node_type)
    h = group_norm(h, sd[p + ".norm2.weights"], sd[p + ".norm2.bias"], gr,
                   channels)
    h = swish(h)
    h = graph_conv(h, sd[p + ".conv2.weights"], gr, n_node_type)
    return h + x


def resblocks(x, sd, p, gr, channels, n_node_type, n):
    for j in range(n):
        x = resblock(x, sd, f"{p}.resblks.{j}", gr, channels, n_node_type)
    return x


def conv1x1(x, sd, p, bias=False):
    y = x @ sd[p + ".linear.weight"].T
    if bias:
        y = y + sd[p + ".linear.bias"]
    return y


def predict_head(x, sd, p, gr, channels):
    h = conv1x1(x, sd, p + ".0.conv")
    h = group_norm(h, sd[p + ".0.gn.weights"], sd[p + ".0.gn.bias"], gr, 32)
    h = torch.nn.functional.gelu(h)
    return conv1x1(h, sd, p + ".1", bias=True)


def down_mix(x, w):
    return x.reshape(-1, x.shape[1] * 8) @ w.flatten(1).t()


def up_mix(x, w):
    return (x @ w.flatten(1)).view(-1, x.shape[1])


def conv1x1_gn_gelu(x, sd, p, gr, cout):
    """Conv1x1GnGelu (`modules.py:222-259` Conv1x1Gn + GELU) applied when
    down/upsample channel counts differ."""
    h = conv1x1(x, sd, p + ".conv")
    h = group_norm(h, sd[p + ".gn.weights"], sd[p + ".gn.bias"], gr, cout)
    return torch.nn.functional.gelu(h)


# ----------------------------------------------------------------------
# whole-VAE forward (fixed topology)
# ----------------------------------------------------------------------
def encode(sd, x, graphs, octree, depth, depth_stop, resblk_num, channels):
    nnum = [int(v) for v in np.asarray(octree.nnum)]
    for i, d in enumerate(range(depth, depth_stop - 1, -1)):
        gr = graphs[d]
        if d == depth:
            x = graph_conv(x, sd["conv1.weights"], gr, depth - 1)
        x = resblocks(x, sd, f"encoder.{i}", gr, channels[d], d - 1,
                      resblk_num - 1)
        if d > depth_stop:
            # GraphDownsample splice (`dualoctree_networks/modules.py:49-64`)
            numd = nnum[d]
            child_prev = np.asarray(octree.child[d - 1])[: nnum[d - 1]]
            leaf_mask = torch.tensor(child_prev < 0)
            lnumd = int(leaf_mask.sum())
            outd = down_mix(x[-numd:], sd[f"downsample.{i}.downsample.weights"])
            out = torch.zeros(leaf_mask.shape[0], x.shape[1], dtype=x.dtype)
            out[leaf_mask] = x[-lnumd - numd:-numd]
            out[~leaf_mask] = outd
            x = torch.cat([x[:-numd - lnumd], out], dim=0)
            if channels[d] != channels[d - 1]:
                x = conv1x1_gn_gelu(
                    x, sd, f"downsample.{i}.conv1x1", graphs[d - 1],
                    channels[d - 1],
                )
    gr = graphs[depth_stop]
    x = group_norm(x, sd["encoder_norm_out.weights"],
                   sd["encoder_norm_out.bias"], gr, channels[depth_stop])
    x = torch.nn.functional.gelu(x)
    code = conv1x1(x, sd, "KL_conv", bias=True)
    mean, logvar = torch.chunk(code, 2, dim=1)
    return mean, logvar


def decode(sd, code, graphs, octree, depth_stop, depth_out, resblk_num,
           channels):
    nnum = [int(v) for v in np.asarray(octree.nnum)]
    x = conv1x1(code, sd, "post_KL_conv", bias=True)
    gr = graphs[depth_stop]
    x = resblocks(x, sd, "decoder_mid.block_1", gr, channels[depth_stop],
                  depth_stop - 1, resblk_num)
    x = resblocks(x, sd, "decoder_mid.block_2", gr, channels[depth_stop],
                  depth_stop - 1, resblk_num)
    logits, regs = {}, {}
    for i, d in enumerate(range(depth_stop, depth_out + 1)):
        if d > depth_stop:
            # GraphUpsample splice (`dualoctree_networks/modules.py:81-91`)
            numd = nnum[d - 1]
            child_prev = np.asarray(octree.child[d - 1])[:numd]
            leaf_mask = torch.tensor(child_prev < 0)
            outd = x[-numd:]
            out1 = up_mix(outd[~leaf_mask],
                          sd[f"upsample.{i - 1}.upsample.weights"])
            x = torch.cat([x[:-numd], outd[leaf_mask], out1], dim=0)
            if channels[d - 1] != channels[d]:
                x = conv1x1_gn_gelu(
                    x, sd, f"upsample.{i - 1}.conv1x1", graphs[d],
                    channels[d],
                )
        gr = graphs[d]
        x = resblocks(x, sd, f"decoder.{i}", gr, channels[d], d - 1,
                      resblk_num)
        logit = predict_head(x, sd, f"predict.{i}", gr, channels[d])
        logits[d] = logit[-nnum[d]:]
        regs[d] = predict_head(x, sd, f"regress.{i}", gr, channels[d])
    return logits, regs


# ----------------------------------------------------------------------
# random reference-layout state dict for a tiny VAE
# ----------------------------------------------------------------------
def make_state_dict(rng, depth, depth_stop, depth_out, resblk_num, channels,
                    embed_dim):
    sd = {}

    def t(*shape, scale=0.2):
        return torch.tensor(
            (rng.normal(size=shape) * scale).astype(np.float32)
        )

    def gconv(p, cin, cout, nt):
        node_ch = nt if nt > 1 else 0
        sd[p + ".weights"] = t(7 * (cin + node_ch), cout)

    def gn(p, c):
        sd[p + ".weights"] = t(1, c, scale=0.5) + 1.0
        sd[p + ".bias"] = t(1, c)

    def blocks(p, c, nt, n):
        for j in range(n):
            q = f"{p}.resblks.{j}"
            gn(q + ".norm1", c)
            gconv(q + ".conv1", c, c, nt)
            gn(q + ".norm2", c)
            gconv(q + ".conv2", c, c, nt)

    def head(p, c, cout):
        sd[p + ".0.conv.linear.weight"] = t(32, c)
        gn(p + ".0.gn", 32)
        sd[p + ".1.linear.weight"] = t(cout, 32)
        sd[p + ".1.linear.bias"] = t(cout)

    gconv("conv1", 4, channels[depth], depth - 1)
    for i, d in enumerate(range(depth, depth_stop - 1, -1)):
        blocks(f"encoder.{i}", channels[d], d - 1, resblk_num - 1)
    for i, d in enumerate(range(depth, depth_stop, -1)):
        sd[f"downsample.{i}.downsample.weights"] = t(
            channels[d], channels[d], 8
        )
        if channels[d] != channels[d - 1]:
            sd[f"downsample.{i}.conv1x1.conv.linear.weight"] = t(
                channels[d - 1], channels[d]
            )
            gn(f"downsample.{i}.conv1x1.gn", channels[d - 1])
    gn("encoder_norm_out", channels[depth_stop])
    sd["KL_conv.linear.weight"] = t(2 * embed_dim, channels[depth_stop])
    sd["KL_conv.linear.bias"] = t(2 * embed_dim)
    sd["post_KL_conv.linear.weight"] = t(channels[depth_stop], embed_dim)
    sd["post_KL_conv.linear.bias"] = t(channels[depth_stop])
    blocks("decoder_mid.block_1", channels[depth_stop], depth_stop - 1,
           resblk_num)
    blocks("decoder_mid.block_2", channels[depth_stop], depth_stop - 1,
           resblk_num)
    for i, d in enumerate(range(depth_stop, depth_out + 1)):
        blocks(f"decoder.{i}", channels[d], d - 1, resblk_num)
        head(f"predict.{i}", channels[d], 2)
        head(f"regress.{i}", channels[d], 4)
    for i, d in enumerate(range(depth_stop + 1, depth_out + 1)):
        sd[f"upsample.{i}.upsample.weights"] = t(
            channels[d - 1], channels[d - 1], 8
        )
        if channels[d - 1] != channels[d]:
            sd[f"upsample.{i}.conv1x1.conv.linear.weight"] = t(
                channels[d], channels[d - 1]
            )
            gn(f"upsample.{i}.conv1x1.gn", channels[d])
    return sd
