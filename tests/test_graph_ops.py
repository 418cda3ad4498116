"""Graph primitive tests vs numpy brute-force oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from octfusion_tpu.octree.octree import OctreeSpec, build_octree, merge_octrees
from octfusion_tpu.octree.dual_graph import build_dual_graph
from octfusion_tpu.ops import graph_ops
from octfusion_tpu.nn import modules


def make_graph(seed=0, depth=4, full_depth=2, n=250, batch=2):
    rng = np.random.RandomState(seed)
    octs = []
    for i in range(batch):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = (0.6 * v).astype(np.float32)
        spec = OctreeSpec.create(
            depth, full_depth, 1, finest_cap_per_sample=4096, decay=1.0
        )
        octs.append(build_octree(jnp.asarray(pts), jnp.asarray(v.astype(np.float32)), spec))
    o = merge_octrees(octs) if batch > 1 else octs[0]
    return o, build_dual_graph(o)


def brute_graph_conv(x, w, lvl, n_node_type=0):
    gcap, c0 = x.shape
    mask = np.asarray(lvl.node_mask)
    if n_node_type > 1:
        onehot = np.zeros((gcap, n_node_type), np.float32)
        nt = np.asarray(lvl.node_type)
        onehot[np.arange(gcap), nt] = 1.0
        onehot[~mask] = 0
        x = np.concatenate([x, onehot], -1)
    c = x.shape[1]
    ne = int(lvl.n_edges)
    row = np.asarray(lvl.edge_row[:ne])
    col = np.asarray(lvl.edge_col[:ne])
    dr = np.asarray(lvl.edge_dir[:ne])
    colbuf = np.zeros((gcap, 7, c), np.float32)
    cnt = np.zeros((gcap, 7), np.int64)
    for r, cc, t in zip(row, col, dr):
        colbuf[r, t] += x[cc]
        cnt[r, t] += 1
    cnt = np.maximum(cnt, 1)
    colbuf = colbuf / cnt[..., None]
    return colbuf.reshape(gcap, 7 * c) @ w


def test_graph_conv_matches_bruteforce():
    o, g = make_graph()
    rng = np.random.RandomState(1)
    for d in [2, 3, 4]:
        lvl = g.level(d)
        gcap = lvl.g_cap
        for ntype in [0, 3]:
            c_in, c_out = 6, 5
            x = rng.normal(size=(gcap, c_in)).astype(np.float32)
            x[~np.asarray(lvl.node_mask)] = 0
            w = rng.normal(
                size=(7 * (c_in + (ntype if ntype > 1 else 0)), c_out)
            ).astype(np.float32)
            got = np.asarray(
                graph_ops.graph_conv(jnp.asarray(x), jnp.asarray(w), lvl, ntype)
            )
            ref = brute_graph_conv(x, w, lvl, ntype)
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def brute_group_norm(x, lvl, scale, bias, group, eps=1e-5):
    gcap, c = x.shape
    cpg = c // group
    mask = np.asarray(lvl.node_mask)
    bid = np.asarray(lvl.node_batch)
    bsz = lvl.spec.ospec.batch_size
    out = np.zeros_like(x)
    for b in range(bsz):
        sel = mask & (bid == b)
        nb = sel.sum()
        count = nb * cpg
        inv = 1.0 / (count + eps)
        mean_c = x[sel].sum(0) * inv  # per-channel sums * inv
        mean = mean_c.reshape(group, cpg).sum(-1, keepdims=True)
        mean = np.broadcast_to(mean, (group, cpg)).reshape(c)
        xc = x[sel] - mean
        var_c = (xc**2).sum(0) * inv
        var = var_c.reshape(group, cpg).sum(-1, keepdims=True)
        var = np.broadcast_to(var, (group, cpg)).reshape(c)
        out[sel] = xc / np.sqrt(var + eps) * scale + bias
    return out


def test_group_norm_matches_bruteforce():
    o, g = make_graph(seed=2)
    rng = np.random.RandomState(3)
    lvl = g.level(3)
    c = 8
    grp = modules.group_count(c)  # 8//4 = 2
    x = rng.normal(size=(lvl.g_cap, c)).astype(np.float32)
    x[~np.asarray(lvl.node_mask)] = 0
    scale = rng.normal(size=(c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)
    got = np.asarray(
        graph_ops.dual_group_norm(
            jnp.asarray(x), lvl, jnp.asarray(scale), jnp.asarray(bias), grp
        )
    )
    ref = brute_group_norm(x, lvl, scale, bias, grp)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # padded rows zero
    assert np.abs(got[~np.asarray(lvl.node_mask)]).sum() == 0


def test_group_count_rules():
    assert modules.group_count(8) == 2
    assert modules.group_count(32) == 8
    assert modules.group_count(64) == 32
    assert modules.group_count(24) == 6
    assert modules.group_count(512) == 32
    # channels > 32 not divisible by 32 -> 30
    assert modules.group_count(90) == 30


def test_splice_roundtrip():
    """Downsample then upsample with identity mixes preserves leaf features
    and routes parent features to all 8 children."""
    o, g = make_graph(seed=4, batch=1)
    d = o.spec.depth
    spec = g.spec
    rng = np.random.RandomState(5)
    c = 4
    x = rng.normal(size=(spec.g_cap(d), c)).astype(np.float32)
    lvl = g.level(d)
    x[~np.asarray(lvl.node_mask)] = 0
    xj = jnp.asarray(x)

    # parents = mean of 8 children
    cur = graph_ops._cur_segment(xj, g, d)
    parents = cur.reshape(-1, 8, c).mean(1)
    down = graph_ops.downsample_splice(xj, parents, g, d)

    lvl_prev = g.level(d - 1)
    down_np = np.asarray(down)
    # valid rows only where prev level mask
    assert np.abs(down_np[~np.asarray(lvl_prev.node_mask)]).sum() == 0

    # leaf features of depth d-1 preserved
    fd = spec.full_depth
    leaf_off = spec.leaf_off(d, d - 1)
    cur_off_prev = spec.cur_off(d - 1)
    child = np.asarray(o.child[d - 1])
    nmask = np.asarray(o.node_mask(d - 1))
    leaf_rank = np.asarray(g.leaf_rank[d - 1 - fd])
    for i in np.where(nmask & (child < 0))[0]:
        np.testing.assert_allclose(
            down_np[cur_off_prev + i], x[leaf_off + leaf_rank[i]]
        )
    # nonempty nodes got their 8-child mean
    cur_np = np.asarray(cur)
    for i in np.where(nmask & (child >= 0))[0]:
        blk = child[i]
        np.testing.assert_allclose(
            down_np[cur_off_prev + i],
            cur_np[blk * 8 : blk * 8 + 8].mean(0),
            rtol=1e-5,
        )

    # upsample with broadcast-to-children mix
    up = graph_ops.upsample_splice(
        down, g, d, lambda p: jnp.repeat(p, 8, axis=0)
    )
    up_np = np.asarray(up)
    # children of nonempty node i get that node's downsampled value
    for i in np.where(nmask & (child >= 0))[0]:
        blk = child[i]
        for j in range(8):
            np.testing.assert_allclose(
                up_np[spec.cur_off(d) + blk * 8 + j],
                down_np[cur_off_prev + i],
                rtol=1e-5,
            )
    # leaves of d-1 moved into the leaf segment
    for i in np.where(nmask & (child < 0))[0]:
        np.testing.assert_allclose(
            up_np[leaf_off + leaf_rank[i]], down_np[cur_off_prev + i]
        )


def test_graph_to_level_arrays():
    o, g = make_graph(seed=6, batch=1)
    d = o.spec.depth
    spec = g.spec
    rng = np.random.RandomState(7)
    lvl = g.level(d)
    x = rng.normal(size=(spec.g_cap(d), 3)).astype(np.float32)
    x[~np.asarray(lvl.node_mask)] = 0
    arrs = graph_ops.graph_to_level_arrays(jnp.asarray(x), g, d)
    fd = spec.full_depth
    for dd in range(fd, d):
        arr = np.asarray(arrs[dd])
        child = np.asarray(o.child[dd])
        nmask = np.asarray(o.node_mask(dd))
        leaf_rank = np.asarray(g.leaf_rank[dd - fd])
        off = spec.leaf_off(d, dd)
        for i in range(arr.shape[0]):
            if nmask[i] and child[i] < 0:
                np.testing.assert_allclose(arr[i], x[off + leaf_rank[i]])
            else:
                assert np.abs(arr[i]).sum() == 0
    arr = np.asarray(arrs[d])
    np.testing.assert_allclose(
        arr, np.asarray(graph_ops._cur_segment(jnp.asarray(x), g, d))
    )


def test_modules_smoke():
    """GraphResBlockEmbed + down/up diff modules run and produce masked
    finite outputs."""
    o, g = make_graph(seed=8, batch=2)
    d = o.spec.depth
    lvl = g.level(d)
    rng = jax.random.PRNGKey(0)
    c = 8
    x = jax.random.normal(rng, (lvl.g_cap, c), jnp.float32)
    x = jnp.where(lvl.node_mask[:, None], x, 0)
    emb = jax.random.normal(rng, (2, 16))

    blk = modules.GraphResBlockEmbed(
        channels=c, emb_channels=16, out_channels=12, n_node_type=d - 1
    )
    params = blk.init(rng, x, emb, lvl)
    y = blk.apply(params, x, emb, lvl)
    assert y.shape == (lvl.g_cap, 12)
    assert bool(jnp.isfinite(y).all())
    # zero-init conv2 => output == skip(x) at init
    skipped = modules.Conv1x1(c, 12).apply(
        {"params": params["params"]["skip_connection"]}, x
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(skipped), atol=1e-5)

    down = modules.GraphDownsampleDiff(12, 12, n_node_type=d - 2)
    pd = down.init(rng, y, g, d)
    yd = down.apply(pd, y, g, d)
    assert yd.shape == (g.spec.g_cap(d - 1), 12)
    up = modules.GraphUpsampleDiff(12, 8, n_node_type=d - 1)
    pu = up.init(rng, yd, g, d)
    yu = up.apply(pu, yd, g, d)
    assert yu.shape == (g.spec.g_cap(d), 8)
    assert bool(jnp.isfinite(yu).all())
