"""Whole-network torch-oracle parity for the diffusion U-Nets (VERDICT r2
item #4): a random reference-layout state dict drives BOTH a torch oracle
implementing the reference formulas end-to-end (tests/torch_ref_unet.py)
and the converted flax networks; forwards must agree numerically.

Covers the full union wiring: lr standalone (self-cond concat, learned
sinusoidal time MLP, attention, label embedding), and hr with the lr
network as its middle block (voxelise -> lr body -> gather,
`graph_unet_hr.py:257-262`, `graph_unet_lr.py:175-182`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import torch_ref_unet as tru
import torch_ref_vae as tref

from octfusion_tpu.nn.unet_lr import UNetLR
from octfusion_tpu.nn.unet_union import UNetUnion, UnionConfig
from octfusion_tpu.octree.octree import OctreeSpec, build_octree, merge_octrees
from octfusion_tpu.octree.dual_graph import build_dual_graph
from octfusion_tpu.utils import torch_convert as tc

LR_CFG = {
    "model_channels": 8,
    "channel_mult": (1, 2),
    "attention_resolutions": (2,),
    "num_heads": 2,
}
# mc=32 keeps every DualOctreeGroupNorm channel count legal under the
# reference's group rule (`modules.py:271-278` asserts divisibility; e.g.
# a 48-channel decoder concat would crash the reference constructor too).
HR_CFG = {
    "model_channels": 32,
    "channel_mult": (1, 2, 4),
    "num_res_blocks": (1, 1, 1),
    "input_depth": 4,
    "full_depth": 2,
}


def test_full_unet_lr_forward_parity():
    rng = np.random.RandomState(11)
    sd = tru.lr_make_state_dict(rng, LR_CFG, num_classes=3)

    B, S, C = 2, 4, 8
    x = torch.tensor(rng.normal(size=(B, C, S, S, S)).astype(np.float32))
    sc = torch.tensor(rng.normal(size=(B, C, S, S, S)).astype(np.float32))
    t = torch.tensor(np.array([0.3, -1.1], np.float32))
    lab = torch.tensor(np.array([0, 2]))

    ref = tru.lr_forward(sd, x, t, LR_CFG, label=lab, x_self_cond=sc)

    params = {"params": jax.tree_util.tree_map(
        jnp.asarray, tc.convert_unet_lr(
            sd, channel_mult=LR_CFG["channel_mult"],
            attention_resolutions=LR_CFG["attention_resolutions"],
        )
    )}
    mod = UNetLR(
        full_depth=2, in_channels=C, model_channels=8, out_channels=C,
        channel_mult=LR_CFG["channel_mult"],
        attention_resolutions=LR_CFG["attention_resolutions"],
        num_heads=2, num_classes=3,
    )
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    scj = jnp.asarray(np.transpose(sc.numpy(), (0, 2, 3, 4, 1)))
    got = mod.apply(params, xj, jnp.asarray(t.numpy()),
                    x_self_cond=scj, label=jnp.asarray(lab.numpy()))
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref.numpy(), rtol=2e-3, atol=2e-3)


def _make_octree(seed=3, depth=4, full_depth=2, n=250, batch=2):
    rng = np.random.RandomState(seed)
    octs = []
    for _ in range(batch):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        spec = OctreeSpec.create(
            depth, full_depth, 1, finest_cap_per_sample=4096, decay=1.0
        )
        octs.append(
            build_octree(
                jnp.asarray((0.6 * v).astype(np.float32)),
                jnp.asarray(v.astype(np.float32)), spec,
            )
        )
    return merge_octrees(octs)


def test_full_unet_hr_union_forward_parity():
    """hr graph U-Net with the lr voxel U-Net as its middle block, via the
    union wrapper and convert_union_ckpt."""
    rng = np.random.RandomState(13)
    o = _make_octree()
    g = build_dual_graph(o)
    fd, idp = HR_CFG["full_depth"], HR_CFG["input_depth"]

    lr_sd = tru.lr_make_state_dict(rng, LR_CFG, num_classes=3)
    hr_sd = tru.hr_make_state_dict(rng, HR_CFG, num_classes=3,
                                   lr_model_channels=LR_CFG["model_channels"])

    graphs = {d: tref.compact_level(g, d) for d in range(fd, idp + 1)}
    ometa = tref.octree_meta(o)
    n = graphs[idp]["n"]
    x = torch.tensor(rng.normal(size=(n, 3)).astype(np.float32))
    t = torch.tensor(np.array([0.4, -0.8], np.float32))
    lab = torch.tensor(np.array([1, 2]))

    # xyzb of the full-depth octree nodes, compact prefix
    xs, ys, zs, bs = o.xyzb(fd)
    nn_fd = int(o.nnum[fd])
    xyzb = tuple(
        torch.tensor(np.asarray(a)[:nn_fd].astype(np.int64))
        for a in (xs, ys, zs, bs)
    )
    ref = tru.hr_forward(hr_sd, x, graphs, ometa, t, HR_CFG, label=lab,
                         lr_sd=lr_sd, lr_cfg=LR_CFG, lr_xyzb=xyzb)

    # ---- converted flax union -----------------------------------------
    ckpt = {"df_unet_lr": lr_sd, "df_unet_hr": hr_sd}
    params = jax.tree_util.tree_map(jnp.asarray, tc.convert_union_ckpt(
        ckpt, channel_mult_lr=LR_CFG["channel_mult"],
        attention_resolutions=LR_CFG["attention_resolutions"],
        channel_mult_hr=HR_CFG["channel_mult"],
        num_res_blocks_hr=HR_CFG["num_res_blocks"], ema=False,
    ))
    cfg = UnionConfig(
        unet_type=("lr", "hr"), df_type=("x0", "eps"),
        input_depth=(fd, idp), full_depth=fd,
        input_channels=(8, 3), out_channels=(8, 3),
        model_channels=(LR_CFG["model_channels"], HR_CFG["model_channels"]),
        num_res_blocks=((1, 1), HR_CFG["num_res_blocks"]),
        channel_mult=(LR_CFG["channel_mult"], HR_CFG["channel_mult"]),
        attention_resolutions=LR_CFG["attention_resolutions"],
        num_heads=LR_CFG["num_heads"], num_classes=3, use_checkpoint=False,
    )
    model = UNetUnion(cfg, stage_flag="hr")

    lvl = g.level(idp)
    mapping = graphs[idp]["mapping"]
    x_pad = np.zeros((lvl.g_cap, 3), np.float32)
    valid = mapping >= 0
    x_pad[valid] = x.numpy()[mapping[valid]]
    got_pad = model.apply(
        params, "hr", jnp.asarray(x_pad), jnp.asarray(t.numpy()), g=g,
        label=jnp.asarray(lab.numpy()),
    )
    # padded -> compact ordering
    vidx = np.nonzero(valid)[0][np.argsort(mapping[valid], kind="stable")]
    got = np.asarray(got_pad)[vidx]
    np.testing.assert_allclose(got, ref.numpy(), rtol=2e-3, atol=2e-3)
