"""Functional graph primitives on :class:`GraphLevel` index tensors.

These are the TPU formulations of the reference's sparse ops:

* ``graph_conv`` — gather + pre-scaled segment-add into the ``[G, 7, C]``
  column buffer, then ONE MXU GEMM ``[G, 7C] @ [7C, C']``
  (`/root/reference/models/networks/modules.py:194-220`).  Because edges are
  sorted by ``row*7+dir`` at graph build time the segment ids are sorted,
  which XLA exploits; the ``1/count`` mean normalisation is folded into the
  per-edge ``edge_scale`` computed once per graph.
* ``dual_group_norm`` — per-sample statistics via segment-sums over batch ids
  (`modules.py:291-326`), fp32 stats.
* ``downsample_splice`` / ``upsample_splice`` — the leaf-preserving level
  moves (`dualoctree_networks/modules.py:39-95`), expressed as static-segment
  gathers (graphs of adjacent levels share their leaf-segment prefix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..octree.dual_graph import DualGraph, GraphLevel, N_EDGE_TYPE


def graph_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    lvl: GraphLevel,
    n_node_type: int = 0,
) -> jnp.ndarray:
    """x: [G, C]; w: [7*(C+node_ch), C_out].  Returns [G, C_out].

    Gather + pre-scaled sorted segment-add into the [G*7, C] column buffer,
    then one MXU GEMM ``[G, 7C] @ [7C, C']``.  (A fixed-fanout
    gather-table variant was benchmarked and lost to segment_sum on v5e —
    the table touches ~3x more rows than there are edges.)  Invalid
    vertices produce zero rows."""
    g = x.shape[0]
    if n_node_type > 1:
        onehot = jax.nn.one_hot(lvl.node_type, n_node_type, dtype=x.dtype)
        onehot = onehot * lvl.node_mask[:, None].astype(x.dtype)
        x = jnp.concatenate([x, onehot], axis=-1)
    if lvl.conv_plan is not None:
        return _graph_conv_fused(x, w, lvl.conv_plan)
    c = x.shape[1]
    gathered = x[jnp.clip(lvl.edge_col, 0, g - 1)]
    gathered = gathered * lvl.edge_scale[:, None].astype(x.dtype)
    # TPU scatter-adds run ~6x faster per row at full 128-lane width than
    # on partial-lane rows (measured 25 vs 156 ns/row at this scale), so
    # pad the channel dim for the segment reduction and slice it back out
    cp = -(-c // 128) * 128
    if cp != c:
        gathered = jnp.pad(gathered, ((0, 0), (0, cp - c)))
    slots = jnp.where(
        lvl.edge_row < g,
        lvl.edge_row * N_EDGE_TYPE + lvl.edge_dir,
        g * N_EDGE_TYPE,
    )
    col = jax.ops.segment_sum(
        gathered, slots, num_segments=g * N_EDGE_TYPE, indices_are_sorted=True
    )
    if cp != c:
        col = col.reshape(g, N_EDGE_TYPE, cp)[:, :, :c]
    col = col.reshape(g, N_EDGE_TYPE * c)
    return jnp.dot(col, w, preferred_element_type=x.dtype)


def _graph_conv_fused(x: jnp.ndarray, w: jnp.ndarray, plan) -> jnp.ndarray:
    """Dispatch to the fused Pallas kernel, padding channels to lane
    multiples (the kernel slices by ``dir * C``).  Interpret mode off-TPU
    keeps CPU tests runnable."""
    from .pallas.graph_conv_kernel import (PackedConvPlan, graph_conv_fused,
                                           graph_conv_packed)

    interpret = jax.default_backend() != "tpu"
    if isinstance(plan, PackedConvPlan):
        graph_conv_fused = graph_conv_packed
    c = x.shape[1]
    cout = w.shape[1]
    cp = -(-c // 128) * 128
    cop = -(-cout // 128) * 128
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, cp - c)))
        w = w.reshape(N_EDGE_TYPE, c, cout)
        w = jnp.pad(w, ((0, 0), (0, cp - c), (0, 0)))
        w = w.reshape(N_EDGE_TYPE * cp, cout)
    if cop != cout:
        w = jnp.pad(w, ((0, 0), (0, cop - cout)))
    out = graph_conv_fused(x, w, plan, interpret)
    return out[:, :cout] if cop != cout else out


def dual_group_norm(
    x: jnp.ndarray,
    lvl: GraphLevel,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    group: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Group norm over per-sample variable-length vertex sets.

    Statistics are computed per (sample, group) over all valid vertices of
    the level; matches `modules.py:291-326` including its
    ``1/(count + eps)`` and ``1/(var + eps)`` conventions."""
    gcap, c = x.shape
    bsz = lvl.spec.ospec.batch_size
    cpg = c // group
    xf = x.astype(jnp.float32)
    mask = lvl.node_mask
    bid = jnp.where(mask, lvl.node_batch, bsz)

    # one-hot matmul reductions: [G, B] indicator x [G, C] features hits the
    # MXU instead of lowering to scatter-adds
    onehot = (
        (lvl.node_batch[:, None] == jnp.arange(bsz, dtype=jnp.int32)[None])
        & mask[:, None]
    ).astype(jnp.float32)                                # [G, B]
    count = jnp.sum(onehot, axis=0)                      # [B]
    count = count[:, None] * cpg
    inv_count = 1.0 / (count + eps)

    def group_adjust(t):  # [B, C] -> per-group sums broadcast back
        if cpg == 1:
            return t
        t = t.reshape(bsz, group, cpg).sum(-1, keepdims=True)
        return jnp.broadcast_to(t, (bsz, group, cpg)).reshape(bsz, c)

    # E[x] and E[x^2] in ONE matmul (concat trick); var = E[x^2] - mean^2
    both = jnp.concatenate([xf, xf * xf], axis=-1)
    sums = jnp.einsum(
        "gb,gc->bc", onehot, both, preferred_element_type=jnp.float32
    )
    xsum, x2sum = sums[:, :c], sums[:, c:]
    mean = group_adjust(xsum) * inv_count
    ex2 = group_adjust(x2sum) * inv_count
    # sum over (nodes, group channels) of (x - m)^2 = sum x^2 - count * m^2,
    # so var = E[x^2] - mean^2 exactly (up to fp rounding)
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    bidc = jnp.clip(bid, 0, bsz - 1)
    out = xf - mean[bidc]
    out = jnp.where(mask[:, None], out, 0.0)
    inv_std = jax.lax.rsqrt(var + eps)
    out = out * inv_std[bidc]
    out = out * scale[None, :] + bias[None, :]
    out = jnp.where(mask[:, None], out, 0.0)
    return out.astype(x.dtype)


def add_batch_embedding(
    x: jnp.ndarray, emb: jnp.ndarray, lvl: GraphLevel
) -> jnp.ndarray:
    """x[i] += emb[batch(i)] on valid vertices — the vectorised form of the
    per-sample python loop at `modules.py:757-758`."""
    bsz = emb.shape[0]
    gathered = emb[jnp.clip(lvl.node_batch, 0, bsz - 1)]
    return x + jnp.where(lvl.node_mask[:, None], gathered, 0.0).astype(x.dtype)


# ----------------------------------------------------------------------
# level moves
# ----------------------------------------------------------------------
def _cur_segment(x: jnp.ndarray, g: DualGraph, d: int) -> jnp.ndarray:
    off = g.spec.cur_off(d)
    return x[off : off + g.spec.ospec.node_caps[d]]


def downsample_splice(
    x: jnp.ndarray,
    parents: jnp.ndarray,
    g: DualGraph,
    d: int,
) -> jnp.ndarray:
    """Splice level-d features into the level-(d-1) vertex layout.

    ``x``: [G_cap(d), C] level-d features; ``parents``: [cap_d/8, C]
    downsampled features for the non-empty nodes of depth d-1 (one per
    8-block of depth d).  Leaf vertices of depth d-1 keep their features from
    x's leaf segment; sub-(d-1) leaf segments are a shared prefix.
    Mirrors `dualoctree_networks/modules.py:49-64`."""
    spec = g.spec
    fd = spec.full_depth
    o = g.octree
    cap_prev = spec.ospec.node_caps[d - 1]

    child = o.child[d - 1]
    leaf_rank = g.leaf_rank[d - 1 - fd]
    leaf_off = spec.leaf_off(d, d - 1)
    is_leaf = (child < 0) & o.node_mask(d - 1)
    leaf_feats = x[leaf_off + jnp.clip(leaf_rank, 0, cap_prev - 1)]
    par_feats = parents[jnp.clip(child, 0, parents.shape[0] - 1)]
    new_cur = jnp.where(
        is_leaf[:, None],
        leaf_feats,
        jnp.where((child >= 0)[:, None], par_feats, 0.0),
    )
    return jnp.concatenate([x[: spec.cur_off(d - 1)], new_cur], axis=0)


def upsample_splice(
    x: jnp.ndarray,
    g: DualGraph,
    d: int,
    up_fn,
) -> jnp.ndarray:
    """Splice level-(d-1) features into the level-d vertex layout.

    ``up_fn`` maps compact non-empty parent features [cap_d/8, C] to their 8
    children [cap_d, C'] (the learned Upsample mix).  Leaf vertices of d-1
    move to the new leaf segment.  Mirrors
    `dualoctree_networks/modules.py:81-91`."""
    spec = g.spec
    fd = spec.full_depth
    o = g.octree
    cap_prev = spec.ospec.node_caps[d - 1]
    cur = _cur_segment(x, g, d - 1)

    # new leaf segment for depth d-1: k-th leaf <- cur[leaf_pos[k]]
    leaf_pos = g.leaf_pos[d - 1 - fd]
    k_ok = jnp.arange(cap_prev, dtype=jnp.int32) < g.lnum[d - 1]
    leaf_seg = jnp.where(
        k_ok[:, None], cur[jnp.clip(leaf_pos, 0, cap_prev - 1)], 0.0
    )

    # children of non-empty nodes
    ne_pos = o.nonempty_position(d - 1)
    k2_ok = jnp.arange(cap_prev, dtype=jnp.int32) < o.nnum_nempty[d - 1]
    ne_feats = jnp.where(k2_ok[:, None], cur[ne_pos], 0.0)
    ne_feats = ne_feats[: spec.ospec.node_caps[d] // 8]
    children = up_fn(ne_feats)  # [cap_d, C']
    nmask = o.node_mask(d)
    children = jnp.where(nmask[:, None], children, 0.0)

    return jnp.concatenate(
        [x[: spec.cur_off(d - 1)], leaf_seg, children], axis=0
    )


def level_input_feature(g: DualGraph) -> jnp.ndarray:
    """Initial feature for the level-``depth`` graph: the octree's finest ND
    signal on current-level vertices, zeros on coarser leaves
    (`dual_octree.py:343-360`)."""
    spec = g.spec
    d = spec.depth
    sig = g.octree.signal
    zeros = jnp.zeros((spec.cur_off(d), sig.shape[1]), sig.dtype)
    return jnp.concatenate([zeros, sig], axis=0)


def graph_to_level_arrays(x: jnp.ndarray, g: DualGraph, d: int):
    """Scatter level-d vertex values into per-depth all-node octree arrays
    (zeros on internal nodes of depths < d) — the layout the MPU consumes
    (the reference's ``reg_vox_pad``, `graph_vae.py:216-221`)."""
    spec = g.spec
    fd = spec.full_depth
    out = {}
    c = x.shape[1]
    cp = -(-c // 128) * 128  # full-lane rows scatter ~6x faster (PERF.md)
    for dd in range(fd, d):
        cap = spec.ospec.node_caps[dd]
        off = spec.leaf_off(d, dd)
        seg = x[off : off + cap]
        # k-th leaf -> slot leaf_pos[k]
        leaf_pos = g.leaf_pos[dd - fd]
        k_ok = jnp.arange(cap, dtype=jnp.int32) < g.lnum[dd]
        tgt = jnp.where(k_ok, leaf_pos, cap)
        src = jnp.where(k_ok[:, None], seg, 0.0)
        if cp != c:
            src = jnp.pad(src, ((0, 0), (0, cp - c)))
        arr = jnp.zeros((cap, src.shape[1]), x.dtype).at[tgt].set(
            src, mode="drop"
        )
        out[dd] = arr[:, :c]
    cur = _cur_segment(x, g, d)
    out[d] = jnp.where(g.octree.node_mask(d)[:, None], cur, 0.0)
    return out
