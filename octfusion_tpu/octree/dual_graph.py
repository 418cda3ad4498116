"""Dual-octree graph as precomputed, padded index tensors.

Re-implements the behaviour of the reference ``DualOctree``
(`/root/reference/models/networks/dualoctree_networks/dual_octree.py`) as
static-shape JAX index math:

* the *level-d graph* has one vertex per octree leaf at depths
  ``full_depth..d-1`` plus one per (every) node at depth ``d``; vertices are
  laid out in static segments — one leaf segment per shallower depth, then
  the current-depth segment — each with a valid prefix;
* edges connect face-adjacent vertices, carry a direction ``0..5``
  (+z,-z,+y,-y,+x,-x seen from the source) and ``6`` for self-loops, and are
  sorted by ``row * 7 + dir`` so the graph convolution's scatter-mean hits
  contiguous runs (`dual_octree.py:332-341`);
* per-edge ``1/count`` scales are precomputed once so scatter-mean becomes a
  weighted scatter-add at every layer.

The recursive refinement (`dual_octree.py:195-239`) is reformulated so each
parent edge expands into at most 4 child slots: the reference additionally
emits reversed copies for the "row internal / col leaf" case, but those are
exactly what the mirror edge (which is always present — the graph is
symmetric) produces under the "row leaf / col internal" rule, so per-edge
fan-out stays bounded and static.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import morton
from .octree import Octree, OctreeSpec

# 6 face-neighbour offsets; row k gives the direction labelled k
# (+z, -z, +y, -y, +x, -x) — order matches the reference lookup table
# (`dual_octree.py:85-89`).
NGH = np.array(
    [[0, 0, 1], [0, 0, -1], [0, 1, 0], [0, -1, 0], [1, 0, 0], [-1, 0, 0]],
    np.int32,
)
# children of a node lying on face k (octant ids), `dual_octree.py:90-94`
DIR_TABLE = np.array(
    [[1, 3, 5, 7], [0, 2, 4, 6], [2, 3, 6, 7], [0, 1, 4, 5],
     [4, 5, 6, 7], [0, 1, 2, 3]],
    np.int32,
)
# opposite face, `dual_octree.py:98-100`
REMAP = np.array([1, 0, 3, 2, 5, 4], np.int32)
# the 24 sibling (within an 8-block) edges, `dual_octree.py:101-112`
INTER_ROW = np.array(
    [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 5, 6, 6, 6, 7, 7, 7],
    np.int32,
)
INTER_COL = np.array(
    [1, 2, 4, 0, 3, 5, 0, 3, 6, 1, 2, 7, 0, 5, 6, 1, 4, 7, 2, 4, 7, 3, 5, 6],
    np.int32,
)
INTER_DIR = np.array(
    [0, 2, 4, 1, 2, 4, 3, 0, 4, 3, 1, 4, 5, 0, 2, 5, 1, 2, 5, 3, 0, 5, 3, 1],
    np.int32,
)

N_EDGE_TYPE = 7  # 6 faces + self-loop


@dataclasses.dataclass(frozen=True)
class GraphSpec:
    """Static layout of the dual graph derived from an :class:`OctreeSpec`.

    ``edge_factor`` bounds edges per graph vertex (the dual graph averages
    ~7; overflow is flagged, not silent).  The default matches
    ``CapacityConfig.edge_factor`` so library callers bypassing Config get
    the same static shapes.
    """

    ospec: OctreeSpec
    edge_factor: int = 9

    @property
    def depth(self) -> int:
        return self.ospec.depth

    @property
    def full_depth(self) -> int:
        return self.ospec.full_depth

    # --- global octree-node index space (depths full_depth..depth) -----
    def goff(self, dd: int) -> int:
        return sum(self.ospec.node_caps[self.full_depth:dd])

    @property
    def gtotal(self) -> int:
        return self.goff(self.depth + 1)

    # --- level-d graph layout ------------------------------------------
    def leaf_off(self, d: int, dd: int) -> int:
        """Offset of depth-``dd`` leaf segment inside the level-d graph."""
        assert self.full_depth <= dd < d
        return sum(self.ospec.node_caps[self.full_depth:dd])

    def cur_off(self, d: int) -> int:
        return sum(self.ospec.node_caps[self.full_depth:d])

    def g_cap(self, d: int) -> int:
        return self.cur_off(d) + self.ospec.node_caps[d]

    def e_cap(self, d: int) -> int:
        if d == self.full_depth:
            # dense level is exact: 6 face neighbours + self loop per vertex
            return 7 * self.g_cap(d)
        return self.edge_factor * self.g_cap(d)


class GraphLevel(struct.PyTreeNode):
    """The level-d dual graph: padded edge lists + per-vertex metadata."""

    d: int = struct.field(pytree_node=False)
    spec: GraphSpec = struct.field(pytree_node=False)
    # edges, sorted by row*7+dir, invalid slots have row = col = g_cap
    edge_row: jnp.ndarray   # int32 [E]
    edge_col: jnp.ndarray   # int32 [E]
    edge_dir: jnp.ndarray   # int32 [E]
    edge_scale: jnp.ndarray  # f32 [E]: 1/|edges with same (row, dir)|, 0 pad
    n_edges: jnp.ndarray    # int32
    # vertices (padded level-d layout)
    node_type: jnp.ndarray   # int32 [G]: native depth - full_depth
    node_batch: jnp.ndarray  # int32 [G], batch_size on padding
    node_mask: jnp.ndarray   # bool  [G]
    node_depthv: jnp.ndarray  # int32 [G]: native octree depth
    node_slot: jnp.ndarray   # int32 [G]: slot in that depth's octree arrays
    n_nodes: jnp.ndarray     # int32
    overflow: jnp.ndarray    # bool — edge capacity exceeded
    # optional fused-conv descriptor plan (ops/pallas/graph_conv_plan.py);
    # None -> graph_conv uses the XLA segment-sum path
    conv_plan: object = None

    @property
    def g_cap(self) -> int:
        return self.spec.g_cap(self.d)


class CarriedEdges(struct.PyTreeNode):
    """Pre-self-loop edges of a level in *global* octree-node index space —
    the state threaded from one refinement level to the next (the
    reference's ``self._graph[d]``)."""

    d: int = struct.field(pytree_node=False)
    row: jnp.ndarray  # int32, sentinel = gtotal
    col: jnp.ndarray
    dir: jnp.ndarray
    overflow: jnp.ndarray


class DualGraph(struct.PyTreeNode):
    """Dual graphs for levels ``full_depth..last_depth`` plus the octree.

    ``carried`` holds the pre-self-loop edges of the deepest built level so
    the graph can be extended one level at a time during decode-side octree
    growth (`graph_vae.py:202-210`)."""

    spec: GraphSpec = struct.field(pytree_node=False)
    octree: Octree
    levels: Tuple[GraphLevel, ...]
    carried: CarriedEdges
    # per-depth leaf index maps shared by all levels (depths fd..last):
    # leaf_rank[dd][slot] = rank among leaves (valid leaves only)
    # leaf_pos[dd][k]     = slot of the k-th leaf
    # lnum[dd]            = number of leaves
    leaf_rank: Tuple[jnp.ndarray, ...]
    leaf_pos: Tuple[jnp.ndarray, ...]
    lnum: jnp.ndarray  # int32 [depth+1] (entries < full_depth unused)

    @property
    def last_depth(self) -> int:
        return self.spec.full_depth + len(self.levels) - 1

    def level(self, d: int) -> GraphLevel:
        return self.levels[d - self.spec.full_depth]

    def any_overflow(self) -> jnp.ndarray:
        """True if the octree or any built level hit a static capacity
        (node caps or edge caps).  Consumers must check this — overflow
        means trailing nodes/edges were silently dropped."""
        ovf = jnp.any(self.octree.overflow)
        for lvl in self.levels:
            ovf = ovf | lvl.overflow
            if lvl.conv_plan is not None:
                ovf = ovf | lvl.conv_plan.overflow
        return ovf


# ----------------------------------------------------------------------
# global node attribute table
# ----------------------------------------------------------------------
def _global_attrs(octree: Octree, spec: GraphSpec):
    """Concatenate per-depth node arrays (depths fd..depth) into the global
    index space used during edge refinement."""
    xyzs, depths, childs, batches, valids = [], [], [], [], []
    for dd in range(spec.full_depth, spec.depth + 1):
        x, y, z, b = octree.xyzb(dd)
        xyzs.append(jnp.stack([x, y, z], -1))
        depths.append(jnp.full((spec.ospec.node_caps[dd],), dd, jnp.int32))
        childs.append(octree.child[dd])
        batches.append(b)
        valids.append(octree.node_mask(dd))
    return (
        jnp.concatenate(xyzs, 0),
        jnp.concatenate(depths, 0),
        jnp.concatenate(childs, 0),
        jnp.concatenate(batches, 0),
        jnp.concatenate(valids, 0),
    )


def _relative_dir(
    xyz_g, depth_g, vi, vj, depth: int, rescale
) -> jnp.ndarray:
    """Face of node ``vi`` (at native depth ``depth``) through which node
    ``vj`` is seen (`dual_octree.py:166-187`).  ``rescale`` is a per-edge
    bool: scale vj's coords up to vi's depth (vj may be coarser)."""
    gt = xyz_g.shape[0]
    vi_c = jnp.clip(vi, 0, gt - 1)
    vj_c = jnp.clip(vj, 0, gt - 1)
    xi = xyz_g[vi_c]
    xj = xyz_g[vj_c]
    dj = depth_g[vj_c]
    scale = jnp.where(rescale, 2 ** jnp.clip(depth - dj, 0, 30), 1).astype(
        jnp.int32
    )
    xj = xj * scale[:, None]
    xn = xi[:, None, :] + jnp.asarray(NGH)[None, :, :]
    inbox = (xn >= xj[:, None, :]) & (xn < (xj + scale[:, None])[:, None, :])
    inbox = jnp.all(inbox, axis=-1)
    return jnp.argmax(inbox, axis=-1).astype(jnp.int32)


# ----------------------------------------------------------------------
# level builders
# ----------------------------------------------------------------------
def dense_level_edges(octree: Octree, spec: GraphSpec) -> CarriedEdges:
    """All 6-neighbour edges of the full level at ``full_depth``
    (`dual_octree.py:124-155`)."""
    fd = spec.full_depth
    b = octree.batch_size
    num = 8**fd
    gt = spec.gtotal

    ki = jnp.arange(num, dtype=jnp.int32)
    x, y, z = morton.key2xyz(ki, fd)
    xi = jnp.stack([x, y, z], -1)                      # [num, 3]
    xj = xi[:, None, :] + jnp.asarray(NGH)[None]       # [num, 6, 3]
    inb = jnp.all((xj >= 0) & (xj < 2**fd), axis=-1)   # [num, 6]
    kj = morton.xyz2key(
        jnp.clip(xj[..., 0], 0, 2**fd - 1),
        jnp.clip(xj[..., 1], 0, 2**fd - 1),
        jnp.clip(xj[..., 2], 0, 2**fd - 1),
        fd,
    )                                                   # [num, 6]
    base = spec.goff(fd) + jnp.arange(b, dtype=jnp.int32)[:, None, None] * num
    row = jnp.broadcast_to(ki[None, :, None], (b, num, 6)) + base
    col = kj[None] + base
    dirs = jnp.broadcast_to(
        jnp.arange(6, dtype=jnp.int32)[None, None, :], (b, num, 6)
    )
    ok = jnp.broadcast_to(inb[None], (b, num, 6))
    row = jnp.where(ok, row, gt).reshape(-1)
    col = jnp.where(ok, col, gt).reshape(-1)
    dirs = jnp.where(ok, dirs, 0).reshape(-1)
    return CarriedEdges(
        d=fd, row=row, col=col, dir=dirs, overflow=jnp.asarray(False)
    )


def expand_level_edges(
    octree: Octree, spec: GraphSpec, prev: CarriedEdges
) -> CarriedEdges:
    """Refine level d-1 edges to level d (`dual_octree.py:195-239`), with the
    bounded 4-slot-per-edge scheme described in the module docstring, plus
    the 24 sibling edges of every new 8-block."""
    d = prev.d + 1
    gt = spec.gtotal
    xyz_g, depth_g, child_g, _, _ = _global_attrs(octree, spec)

    row, col, dirs = prev.row, prev.col, prev.dir
    e_valid = row < gt
    ci = jnp.where(e_valid, child_g[jnp.clip(row, 0, gt - 1)], -1)
    cj = jnp.where(e_valid, child_g[jnp.clip(col, 0, gt - 1)], -1)
    i_int = ci >= 0
    j_int = cj >= 0

    # relative directions (computed unconditionally, selected by case)
    rel_i = _relative_dir(xyz_g, depth_g, row, col, d - 1, rescale=~j_int)
    rel_j = _relative_dir(xyz_g, depth_g, col, row, d - 1, rescale=True)

    goff_d = spec.goff(d)
    dt = jnp.asarray(DIR_TABLE)       # [6, 4]
    rm = jnp.asarray(REMAP)

    k4 = jnp.arange(4)
    # case both-leaf: carry (slot 0 only)
    r_leaf = jnp.where((~i_int) & (~j_int) & e_valid, row, gt)
    out_r0 = r_leaf
    out_c0 = col
    out_d0 = dirs

    # case row internal (col leaf): children of i facing j  ->  j
    chi = goff_d + ci * 8
    r_i = chi[:, None] + dt[rel_i]                     # [E, 4]
    c_i = jnp.broadcast_to(col[:, None], r_i.shape)
    d_i = jnp.broadcast_to(rel_i[:, None], r_i.shape)

    # case col internal (row leaf): i -> children of j facing i
    chj = goff_d + cj * 8
    r_j = jnp.broadcast_to(row[:, None], (row.shape[0], 4))
    c_j = chj[:, None] + dt[rel_j]
    d_j = jnp.broadcast_to(rm[rel_j][:, None], r_j.shape)

    # case both internal: matched face children
    r_b = chi[:, None] + dt[rel_i]
    c_b = chj[:, None] + dt[rm[rel_i]]
    d_b = jnp.broadcast_to(rel_i[:, None], r_b.shape)

    sel_i = (i_int & ~j_int & e_valid)[:, None]
    sel_j = (~i_int & j_int & e_valid)[:, None]
    sel_b = (i_int & j_int & e_valid)[:, None]
    out_r4 = jnp.where(sel_i, r_i, jnp.where(sel_j, r_j, jnp.where(sel_b, r_b, gt)))
    out_c4 = jnp.where(sel_i, c_i, jnp.where(sel_j, c_j, jnp.where(sel_b, c_b, gt)))
    out_d4 = jnp.where(sel_i, d_i, jnp.where(sel_j, d_j, jnp.where(sel_b, d_b, 0)))
    del k4

    # sibling edges inside every new 8-block at depth d
    nblk = spec.ospec.node_caps[d] // 8
    blk = jnp.arange(nblk, dtype=jnp.int32)[:, None]
    blk_ok = blk * 8 < octree.nnum[d]
    ir = goff_d + blk * 8 + jnp.asarray(INTER_ROW)[None]
    ic = goff_d + blk * 8 + jnp.asarray(INTER_COL)[None]
    idd = jnp.broadcast_to(jnp.asarray(INTER_DIR)[None], ir.shape)
    ir = jnp.where(blk_ok, ir, gt)
    ic = jnp.where(blk_ok, ic, gt)

    cand_r = jnp.concatenate([out_r0, out_r4.reshape(-1), ir.reshape(-1)])
    cand_c = jnp.concatenate([out_c0, out_c4.reshape(-1), ic.reshape(-1)])
    cand_d = jnp.concatenate([out_d0, out_d4.reshape(-1), idd.reshape(-1)])
    cand_c = jnp.where(cand_r < gt, cand_c, gt)
    cand_d = jnp.where(cand_r < gt, cand_d, 0)

    # compact valid edges to the front, truncate to static capacity — one
    # variadic (row*7+dir, col) sort instead of argsort + three gathers
    # over the ~4M-row candidate arrays (same trick as finalize_level;
    # within equal keys the stable sort preserves candidate order, so
    # downstream results are unchanged)
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(
        cand_r < gt, cand_r * N_EDGE_TYPE + cand_d, big
    )
    key, cand_c = jax.lax.sort(
        (key, cand_c), dimension=0, num_keys=1, is_stable=True
    )
    cap = spec.e_cap(d)
    key = key[:cap]
    col = cand_c[:cap]
    valid = key != big
    n_valid = jnp.sum((cand_r < gt).astype(jnp.int32))
    return CarriedEdges(
        d=d,
        row=jnp.where(valid, key // N_EDGE_TYPE, gt),
        col=jnp.where(valid, col, gt),
        dir=jnp.where(valid, key % N_EDGE_TYPE, 0),
        overflow=prev.overflow | (n_valid > cap),
    )


def _leaf_maps(octree: Octree, dd: int):
    """(leaf_rank, leaf_pos, lnum) for depth dd."""
    cap = octree.spec.node_caps[dd]
    leaf = octree.node_mask(dd) & (octree.child[dd] < 0)
    rank = jnp.cumsum(leaf.astype(jnp.int32)) - 1
    leaf_rank = jnp.where(leaf, rank, cap)
    pos = jnp.full((cap,), cap, jnp.int32).at[
        jnp.where(leaf, rank, cap)
    ].set(
        jnp.where(leaf, jnp.arange(cap, dtype=jnp.int32), cap), mode="drop"
    )
    return leaf_rank, pos, jnp.sum(leaf.astype(jnp.int32))


def finalize_level(
    octree: Octree,
    spec: GraphSpec,
    carried: CarriedEdges,
    leaf_maps=None,
) -> GraphLevel:
    """Remap carried (global-index) edges into the level-d vertex layout,
    add self-loops, sort by row*7+dir and precompute scatter-mean scales
    (the reference's ``post_processing_for_docnn``, `dual_octree.py:400-409`).
    """
    d = carried.d
    fd = spec.full_depth
    gt = spec.gtotal
    gcap = spec.g_cap(d)

    # ---- vertex remap: global index -> level-d layout -----------------
    remap_segs = []
    node_type, node_batch, node_mask, node_depthv, node_slot = [], [], [], [], []
    n_nodes = jnp.asarray(0, jnp.int32)
    for dd in range(fd, d):
        cap = spec.ospec.node_caps[dd]
        if leaf_maps is not None:
            leaf_rank, leaf_pos, lnum = leaf_maps[dd]
        else:
            leaf_rank, leaf_pos, lnum = _leaf_maps(octree, dd)
        off = spec.leaf_off(d, dd)
        remap_segs.append(
            jnp.where(leaf_rank < cap, off + leaf_rank, gcap).astype(jnp.int32)
        )
        # leaf segment vertex attrs (k-th leaf)
        k_ok = jnp.arange(cap, dtype=jnp.int32) < lnum
        slot = jnp.clip(leaf_pos, 0, cap - 1)
        node_type.append(jnp.where(k_ok, dd - fd, 0).astype(jnp.int32))
        node_batch.append(
            jnp.where(k_ok, octree.batch[dd][slot], octree.batch_size).astype(
                jnp.int32
            )
        )
        node_mask.append(k_ok)
        node_depthv.append(jnp.where(k_ok, dd, 0).astype(jnp.int32))
        node_slot.append(jnp.where(k_ok, slot, 0).astype(jnp.int32))
        n_nodes = n_nodes + lnum
    cap_d = spec.ospec.node_caps[d]
    cur_off = spec.cur_off(d)
    cur_ok = octree.node_mask(d)
    remap_segs.append(
        jnp.where(
            cur_ok, cur_off + jnp.arange(cap_d, dtype=jnp.int32), gcap
        ).astype(jnp.int32)
    )
    node_type.append(jnp.where(cur_ok, d - fd, 0).astype(jnp.int32))
    node_batch.append(
        jnp.where(cur_ok, octree.batch[d], octree.batch_size).astype(jnp.int32)
    )
    node_mask.append(cur_ok)
    node_depthv.append(jnp.where(cur_ok, d, 0).astype(jnp.int32))
    node_slot.append(
        jnp.where(cur_ok, jnp.arange(cap_d, dtype=jnp.int32), 0)
    )
    n_nodes = n_nodes + octree.nnum[d]

    remap = jnp.concatenate(remap_segs)  # [goff(d+1) - goff(fd)]
    # pad to the full global table so clipping is unnecessary
    remap = jnp.concatenate(
        [remap, jnp.full((gt - remap.shape[0],), gcap, jnp.int32)]
    )

    e_ok = carried.row < gt
    row = jnp.where(e_ok, remap[jnp.clip(carried.row, 0, gt - 1)], gcap)
    col = jnp.where(e_ok, remap[jnp.clip(carried.col, 0, gt - 1)], gcap)
    # an edge endpoint that failed to remap (shouldn't happen) drops the edge
    bad = (row >= gcap) | (col >= gcap)
    row = jnp.where(bad, gcap, row)
    col = jnp.where(bad, gcap, col)
    dirs = jnp.where(bad, 0, carried.dir)

    # ---- self-loops (dir 6) on vertices that have at least one edge ----
    has_edge = jnp.zeros((gcap,), bool).at[row].set(True, mode="drop")
    loop_idx = jnp.arange(gcap, dtype=jnp.int32)
    loop_row = jnp.where(has_edge, loop_idx, gcap)

    all_row = jnp.concatenate([row, loop_row])
    all_col = jnp.concatenate([col, loop_row])
    all_dir = jnp.concatenate([dirs, jnp.full((gcap,), 6, jnp.int32)])

    # ---- sort by row * 7 + dir ----------------------------------------
    # one variadic key+payload sort instead of argsort + three permutation
    # gathers (gathers run at ~8-16 ns/row; at level 8 the 2M-row edge
    # arrays made them the decode-time topology wall — PERF.md)
    big = jnp.iinfo(jnp.int32).max
    sort_key = jnp.where(
        all_row < gcap, all_row * N_EDGE_TYPE + all_dir, big
    )
    sort_key, all_col = jax.lax.sort(
        (sort_key, all_col), dimension=0, num_keys=1, is_stable=True
    )
    valid_e = sort_key != big
    all_row = jnp.where(valid_e, sort_key // N_EDGE_TYPE, gcap)
    all_dir = jnp.where(valid_e, sort_key % N_EDGE_TYPE, 0)
    n_edges = jnp.sum(valid_e.astype(jnp.int32))

    # ---- per-edge scatter-mean scale ----------------------------------
    # edges are sorted by slot, so per-slot counts are run lengths — two
    # log-depth scans instead of a [gcap*7] scatter-add + a 2M-row gather
    n_all = sort_key.shape[0]
    eidx = jnp.arange(n_all, dtype=jnp.int32)
    newrun = jnp.concatenate(
        [jnp.ones((1,), bool), sort_key[1:] != sort_key[:-1]]
    )
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(newrun, eidx, -1)
    )
    bound = jnp.where(newrun, eidx, n_all)
    nxt = jax.lax.associative_scan(jnp.minimum, bound, reverse=True)
    run_end = jnp.concatenate(
        [nxt[1:], jnp.full((1,), n_all, jnp.int32)]
    )
    scale = jnp.where(
        valid_e,
        1.0 / jnp.maximum(run_end - run_start, 1).astype(jnp.float32),
        0.0,
    )

    return GraphLevel(
        d=d,
        spec=spec,
        edge_row=all_row.astype(jnp.int32),
        edge_col=all_col.astype(jnp.int32),
        edge_dir=all_dir.astype(jnp.int32),
        edge_scale=scale,
        n_edges=n_edges,
        node_type=jnp.concatenate(node_type),
        node_batch=jnp.concatenate(node_batch),
        node_mask=jnp.concatenate(node_mask),
        node_depthv=jnp.concatenate(node_depthv),
        node_slot=jnp.concatenate(node_slot),
        n_nodes=n_nodes,
        overflow=carried.overflow,
    )


def build_dual_graph(
    octree: Octree, edge_factor: int = 9, up_to: int = None
) -> DualGraph:
    """Build dual graphs for levels full_depth..``up_to`` (default: depth)
    (``DualOctree(octree); post_processing_for_docnn()``)."""
    spec = GraphSpec(octree.spec, edge_factor)
    fd = spec.full_depth
    last = spec.depth if up_to is None else up_to

    leaf_maps = {}
    leaf_rank, leaf_pos, lnum = [], [], []
    for dd in range(fd, last + 1):
        leaf_maps[dd] = _leaf_maps(octree, dd)
        leaf_rank.append(leaf_maps[dd][0])
        leaf_pos.append(leaf_maps[dd][1])
        lnum.append(leaf_maps[dd][2])

    carried = dense_level_edges(octree, spec)
    levels = [finalize_level(octree, spec, carried, leaf_maps)]
    for d in range(fd + 1, last + 1):
        carried = expand_level_edges(octree, spec, carried)
        levels.append(finalize_level(octree, spec, carried, leaf_maps))

    lnum_arr = jnp.zeros((spec.depth + 1,), jnp.int32)
    for i, dd in enumerate(range(fd, last + 1)):
        lnum_arr = lnum_arr.at[dd].set(lnum[i])
    return DualGraph(
        spec=spec,
        octree=octree,
        levels=tuple(levels),
        carried=carried,
        leaf_rank=tuple(leaf_rank),
        leaf_pos=tuple(leaf_pos),
        lnum=lnum_arr,
    )


def with_conv_plans(
    g: DualGraph, tile_t: int = 128, desc_factor: int = 56,
    depths=None, packed: bool = False,
) -> DualGraph:
    """Attach fused-conv descriptor plans (built once per shape, reused by
    every conv of every sampling step) to the given ``depths`` (default:
    all built levels).  ``graph_ops.graph_conv`` switches to the Pallas
    kernel wherever a plan is present.  ``packed`` builds the forward-only
    k-packed layout (sampling only — it has no backward)."""
    from ..ops.pallas.graph_conv_plan import (build_conv_plan,
                                              build_packed_conv_plan)

    builder = build_packed_conv_plan if packed else build_conv_plan
    levels = []
    for lvl in g.levels:
        if depths is None or lvl.d in depths:
            levels.append(
                lvl.replace(
                    conv_plan=builder(lvl, tile_t, desc_factor)
                )
            )
        else:
            levels.append(lvl)
    return g.replace(levels=tuple(levels))


def extend_dual_graph(g: DualGraph, octree: Octree) -> DualGraph:
    """Add the next level's graph after the octree grew one depth deeper.

    ``octree`` must be ``g.octree`` split at ``g.last_depth`` and grown to
    ``g.last_depth + 1``; leaf maps of the split depth are recomputed (its
    leaves changed when children were assigned)."""
    spec = g.spec
    fd = spec.full_depth
    d_prev = g.last_depth
    d_new = d_prev + 1

    lm_prev = _leaf_maps(octree, d_prev)
    lm_new = _leaf_maps(octree, d_new)
    leaf_maps = {}
    for i, dd in enumerate(range(fd, d_prev)):
        leaf_maps[dd] = (g.leaf_rank[i], g.leaf_pos[i], g.lnum[dd])
    leaf_maps[d_prev] = lm_prev
    leaf_maps[d_new] = lm_new

    carried = expand_level_edges(octree, spec, g.carried)
    lvl = finalize_level(octree, spec, carried, leaf_maps)

    lnum_arr = g.lnum.at[d_prev].set(lm_prev[2]).at[d_new].set(lm_new[2])
    return g.replace(
        octree=octree,
        levels=g.levels + (lvl,),
        carried=carried,
        leaf_rank=g.leaf_rank[: d_prev - fd] + (lm_prev[0], lm_new[0]),
        leaf_pos=g.leaf_pos[: d_prev - fd] + (lm_prev[1], lm_new[1]),
        lnum=lnum_arr,
    )
