"""Torch->JAX conversion parity tests.

For each converted module family we build a small *torch* module whose
parameter layout and forward math follow the reference (state-dict keys
included), convert its state dict, and check numerical agreement of the JAX
module — the oracle strategy SURVEY.md §4 prescribes for checkpoint
compatibility."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from octfusion_tpu.nn import modules
from octfusion_tpu.utils import torch_convert as tc


def test_child_mix_parity():
    c, n = 6, 4
    rng = np.random.RandomState(0)
    w = torch.tensor(rng.normal(size=(c, c, 8)).astype(np.float32))
    x = torch.tensor(rng.normal(size=(8 * n, c)).astype(np.float32))

    # reference Downsample forward (`modules.py:392-395`)
    ref_down = (x.view(-1, c * 8) @ w.flatten(1).t()).numpy()
    m = tc._np(w)
    t = {}
    tc._down_mix({"d.weights": w}, "d", t, ("d",))
    got = np.asarray(
        jnp.dot(jnp.asarray(x.numpy()).reshape(-1, 8 * c), jnp.asarray(t["d"]["weights"]))
    )
    np.testing.assert_allclose(got, ref_down, rtol=1e-5, atol=1e-5)

    # reference Upsample forward (`modules.py:440-443`)
    xp = torch.tensor(rng.normal(size=(n, c)).astype(np.float32))
    ref_up = (xp @ w.flatten(1)).view(-1, c).numpy()
    t2 = {}
    tc._up_mix({"u.weights": w}, "u", t2, ("u",))
    got_up = np.asarray(
        jnp.dot(jnp.asarray(xp.numpy()), jnp.asarray(t2["u"]["weights"]))
    ).reshape(-1, c)
    np.testing.assert_allclose(got_up, ref_up, rtol=1e-5, atol=1e-5)
    del m


def test_conv3d_parity():
    rng = np.random.RandomState(1)
    tconv = torch.nn.Conv3d(3, 5, 3, padding=1)
    x = torch.tensor(rng.normal(size=(2, 3, 4, 4, 4)).astype(np.float32))
    ref = tconv(x).detach().numpy()  # NCDHW

    t = {}
    tc._conv3d({"c.weight": tconv.weight, "c.bias": tconv.bias}, "c", t, ("c",))
    mod = modules.ConvNd(5)
    params = {"params": {"conv": t["c"]}}
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))  # NDHWC
    got = np.asarray(mod.apply(jax.tree_util.tree_map(jnp.asarray, params), xj))
    got = np.transpose(got, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_attention_block_parity():
    """Full AttentionBlock: torch reference math vs AttentionBlock3D."""
    rng = np.random.RandomState(2)
    c, heads, b, s = 8, 2, 2, 3

    norm = torch.nn.GroupNorm(min(32, c), c)
    qkv = torch.nn.Conv1d(c, 3 * c, 1)
    proj = torch.nn.Conv1d(c, c, 1)
    with torch.no_grad():
        norm.weight.copy_(torch.tensor(rng.normal(size=(c,)).astype(np.float32)))
        norm.bias.copy_(torch.tensor(rng.normal(size=(c,)).astype(np.float32)))
        qkv.weight.copy_(torch.tensor(rng.normal(size=(3 * c, c, 1)).astype(np.float32)))
        qkv.bias.copy_(torch.tensor(rng.normal(size=(3 * c,)).astype(np.float32)))
        proj.weight.copy_(torch.tensor(rng.normal(size=(c, c, 1)).astype(np.float32)))
        proj.bias.copy_(torch.tensor(rng.normal(size=(c,)).astype(np.float32)))

    x = torch.tensor(rng.normal(size=(b, c, s, s, s)).astype(np.float32))

    # reference forward (`modules.py:515-547`)
    import math

    xf = x.reshape(b, c, -1)
    q = qkv(norm(xf))
    q = q.reshape(b * heads, -1, q.shape[2])
    ch = q.shape[1] // 3
    qq, kk, vv = torch.split(q, ch, dim=1)
    scale = 1 / math.sqrt(math.sqrt(ch))
    att = torch.einsum("bct,bcs->bts", qq * scale, kk * scale)
    att = torch.softmax(att, dim=-1)
    h = torch.einsum("bts,bcs->bct", att, vv)
    h = h.reshape(b, -1, h.shape[-1])
    h = proj(h)
    ref = (xf + h).reshape(b, c, s, s, s).detach().numpy()

    t = {}
    tc._attention3d(
        {
            "a.norm.weight": norm.weight, "a.norm.bias": norm.bias,
            "a.qkv.weight": qkv.weight, "a.qkv.bias": qkv.bias,
            "a.proj_out.weight": proj.weight, "a.proj_out.bias": proj.bias,
        },
        "a", t, ("a",),
    )
    mod = modules.AttentionBlock3D(c, num_heads=heads)
    params = {"params": jax.tree_util.tree_map(jnp.asarray, t["a"])}
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    got = np.asarray(mod.apply(params, xj))
    got = np.transpose(got, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_vae_converter_covers_all_keys():
    """Every parameter the flax GraphVAE owns is produced by the converter
    from a synthetic torch-style state dict (structure check on a tiny
    config)."""
    from octfusion_tpu.nn.vae import GraphVAE
    from octfusion_tpu.octree.octree import OctreeSpec, build_octree
    from octfusion_tpu.octree.dual_graph import build_dual_graph

    rng = np.random.RandomState(3)
    v = rng.normal(size=(200, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    spec = OctreeSpec.create(4, 2, 1, finest_cap_per_sample=2048, decay=1.0)
    o = build_octree(
        jnp.asarray((0.6 * v).astype(np.float32)),
        jnp.asarray(v.astype(np.float32)), spec,
    )
    g = build_dual_graph(o)
    vae = GraphVAE(
        depth=4, full_depth=2, depth_stop=3, depth_out=4, embed_dim=2,
        resblk_num=2, channels=(4, 8, 8, 8, 8), use_checkpoint=False,
    )
    key = jax.random.PRNGKey(0)
    params = vae.init(key, g, g, key)

    # synthesise a torch state dict with the reference's key layout matching
    # the flax shapes, then convert and compare tree structure + shapes
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    conv = tc.convert_vae(
        _make_reference_style_sd(params["params"]),
        depth=4, depth_stop=3, depth_out=4, resblk_num=2,
    )
    got_paths = {
        tuple(p.key for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(conv["params"])[0]
    }
    want_paths = {
        tuple(p.key for p in path) for path, _ in flat
    }
    assert got_paths == want_paths, (
        f"missing={sorted(want_paths - got_paths)[:8]} "
        f"extra={sorted(got_paths - want_paths)[:8]}"
    )
    # shapes agree
    conv_flat = dict(
        (tuple(p.key for p in path), v)
        for path, v in jax.tree_util.tree_flatten_with_path(conv["params"])[0]
    )
    for path, v in flat:
        k = tuple(p.key for p in path)
        assert conv_flat[k].shape == v.shape, (k, conv_flat[k].shape, v.shape)


def _make_reference_style_sd(flax_params):
    """Build a torch-style state dict (reference key layout) with shapes
    derived from the flax params of the tiny VAE."""
    sd = {}

    def walk(tree, path):
        for k, v in tree.items():
            walk(v, path + (k,)) if isinstance(v, dict) else emit(path + (k,), v)

    def emit(path, arr):
        a = np.asarray(arr)
        key, val = _flax_path_to_torch(path, a)
        sd[key] = torch.tensor(val)

    walk(flax_params, ())
    return sd


def _flax_path_to_torch(path, a):
    parts = list(path)
    out = []
    for p in parts[:-1]:
        for pref in ("encoder", "decoder", "downsample", "upsample",
                     "predict", "regress", "resblks"):
            if p.startswith(pref + "_") and p[len(pref) + 1:].isdigit():
                p = pref + "." + p[len(pref) + 1:]
        out.append(p)
    joined = ".".join(out)
    joined = joined.replace("decoder_mid_block_1", "decoder_mid.block_1")
    joined = joined.replace("decoder_mid_block_2", "decoder_mid.block_2")
    # predict/regress heads
    joined = joined.replace(".head0.conv", ".0.conv").replace(
        ".head0.gn", ".0.gn"
    ).replace(".head1", ".1")
    leaf = parts[-1]
    if leaf == "kernel":
        return joined + ".weight", a.T
    if leaf == "bias" and a.ndim == 1 and "gn" not in joined.split(".")[-1:] \
            and not joined.endswith("norm_out") and "norm" not in joined.split(".")[-1]:
        # graph-norm biases are [1, C] in torch; linear biases 1-d
        pass
    if leaf == "weights":
        last = joined.split(".")[-1]
        if last in ("gn",) or "norm" in last or joined.endswith("norm_out"):
            return joined + ".weights", a.reshape(1, -1)
        if last == "downsample":
            c = a.shape[1]
            w = np.zeros((c, c, 8), a.dtype)
            q = np.arange(8 * c)
            w[:, q // 8, q % 8] = a.T
            return joined + ".weights", w
        if last == "upsample":
            c = a.shape[0]
            w = np.zeros((c, c, 8), a.dtype)
            p = np.arange(8 * c)
            w[:, p // 8, p % 8] = a
            return joined + ".weights", w
        return joined + ".weights", a  # GraphConv
    if leaf == "bias":
        last = joined.split(".")[-1]
        if last in ("gn",) or "norm" in last or joined.endswith("norm_out"):
            return joined + ".bias", a.reshape(1, -1)
        return joined + ".bias", a
    raise AssertionError((path, a.shape))


def test_full_vae_forward_parity():
    """Whole-network converter parity (VERDICT round-1 item 6): a random
    reference-layout torch state dict drives BOTH a torch oracle
    implementing the reference formulas end-to-end (tests/torch_ref_vae.py)
    and the converted flax GraphVAE; encode (mean/logvar) and fixed-topology
    decode (split logits + MPU regressions at every depth) must agree."""
    import torch_ref_vae as tref

    from octfusion_tpu.nn.vae import GraphVAE
    from octfusion_tpu.octree.octree import OctreeSpec, build_octree
    from octfusion_tpu.octree.dual_graph import build_dual_graph

    depth, fd, ds, dout, rbn, e = 4, 2, 3, 4, 2, 2
    channels = (4, 8, 8, 8, 16, 8)[: depth + 1]
    channels = (4, 8, 8, 16, 8)
    rng = np.random.RandomState(7)
    v = rng.normal(size=(300, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = 0.55 + 0.2 * np.sin(4 * v[:, 0])
    spec = OctreeSpec.create(depth, fd, 1, finest_cap_per_sample=2048,
                             decay=1.0)
    o = build_octree(
        jnp.asarray((r[:, None] * v).astype(np.float32)),
        jnp.asarray(v.astype(np.float32)), spec,
    )
    g = build_dual_graph(o)

    sd = tref.make_state_dict(rng, depth, ds, dout, rbn, channels, e)

    # ---- torch oracle --------------------------------------------------
    graphs = {d: tref.compact_level(g, d) for d in range(ds, depth + 1)}
    nn_depth = int(o.nnum[depth])
    sig = np.asarray(o.signal)[:nn_depth]
    n_coarse_leaves = graphs[depth]["n"] - nn_depth
    x0 = torch.tensor(
        np.concatenate(
            [np.zeros((n_coarse_leaves, 4), np.float32), sig]
        )
    )
    t_mean, t_logvar = tref.encode(sd, x0, graphs, o, depth, ds, rbn,
                                   channels)
    t_logits, t_regs = tref.decode(sd, t_mean, graphs, o, ds, dout, rbn,
                                   channels)

    # ---- converted flax ------------------------------------------------
    params = tc.convert_vae(sd, depth=depth, depth_stop=ds, depth_out=dout,
                            resblk_num=rbn)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    vae = GraphVAE(depth=depth, full_depth=fd, depth_stop=ds, depth_out=dout,
                   embed_dim=e, resblk_num=rbn, channels=channels,
                   use_checkpoint=False)
    j_mean, j_logvar = vae.apply(params, g, method=GraphVAE.encode)
    out = vae.apply(params, j_mean, g, method=GraphVAE.decode)

    # encode parity on the compact positions
    m_ds = graphs[ds]["mapping"]
    valid = np.nonzero(m_ds >= 0)[0]
    order = np.argsort(m_ds[valid], kind="stable")
    vidx = valid[order]
    np.testing.assert_allclose(
        np.asarray(j_mean)[vidx], t_mean.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_logvar)[vidx], t_logvar.numpy(), rtol=2e-4, atol=2e-4
    )

    # decode parity: split logits per depth (current segment, valid prefix)
    for d in range(ds, dout + 1):
        nn_d = int(o.nnum[d])
        np.testing.assert_allclose(
            np.asarray(out["logits"][d])[:nn_d], t_logits[d].numpy(),
            rtol=2e-3, atol=2e-3,
        )
    # regression heads: compare on octree slots per contributing depth
    for d in range(ds, dout + 1):
        gr = graphs[d]
        treg = t_regs[d].numpy()
        pos = 0
        for dd in range(fd, d):
            slots = gr["seg_slots"][dd]
            seg = treg[pos: pos + len(slots)]
            got = np.asarray(out["reg_voxs"][d][dd])[slots]
            np.testing.assert_allclose(got, seg, rtol=2e-3, atol=2e-3)
            pos += len(slots)
        nn_d = int(o.nnum[d])
        np.testing.assert_allclose(
            np.asarray(out["reg_voxs"][d][d])[:nn_d], treg[pos: pos + nn_d],
            rtol=2e-3, atol=2e-3,
        )
