"""Dual-graph builder tests against a brute-force geometric oracle.

The dual octree graph at level d is, by definition, the face-adjacency graph
of {octree leaves at depths full_depth..d-1} ∪ {all nodes at depth d}
(per sample), with edge direction = the face of the source box through which
the target is seen, plus self-loops on non-isolated vertices.  The oracle
builds exactly that from box geometry, independent of the recursive
refinement being tested."""

import numpy as np
import jax.numpy as jnp

from octfusion_tpu.octree.octree import OctreeSpec, build_octree, merge_octrees
from octfusion_tpu.octree.dual_graph import build_dual_graph


def sphere_cloud(n, seed, r=0.6):
    rng = np.random.RandomState(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (r * v).astype(np.float32), v.astype(np.float32)


def make_octree(seed=0, depth=4, full_depth=2, n=300):
    pts, nrm = sphere_cloud(n, seed)
    spec = OctreeSpec.create(
        depth, full_depth, 1, finest_cap_per_sample=4096, decay=1.0
    )
    return build_octree(jnp.asarray(pts), jnp.asarray(nrm), spec)


def oracle_vertices(o, d):
    """list of (depth, slot, batch, x, y, z) graph vertices at level d, in
    [leaves(fd)..leaves(d-1), all(d)] order."""
    from octfusion_tpu.octree import morton as M

    fd = o.spec.full_depth
    verts = []
    for dd in range(fd, d):
        nn = int(o.nnum[dd])
        child = np.asarray(o.child[dd][:nn])
        keys = np.asarray(o.keys[dd][:nn])
        bt = np.asarray(o.batch[dd][:nn])
        for i in np.where(child < 0)[0]:
            x, y, z = (int(v) for v in
                       (np.asarray(M.key2xyz(jnp.asarray([keys[i]]), dd))[:, 0]))
            verts.append((dd, int(i), int(bt[i]), x, y, z))
    nn = int(o.nnum[d])
    keys = np.asarray(o.keys[d][:nn])
    bt = np.asarray(o.batch[d][:nn])
    for i in range(nn):
        x, y, z = (int(v) for v in
                   (np.asarray(M.key2xyz(jnp.asarray([keys[i]]), d))[:, 0]))
        verts.append((d, int(i), int(bt[i]), x, y, z))
    return verts


def oracle_edges(verts, depth_ref):
    """set of (ia, ib, dir): boxes face-adjacent, dir seen from a."""
    boxes = []
    for dd, _slot, b, x, y, z in verts:
        s = 2 ** (depth_ref - dd)
        boxes.append((b, x * s, y * s, z * s, s))
    edges = set()
    n = len(boxes)
    for ia in range(n):
        ba, xa, ya, za, sa = boxes[ia]
        for ib in range(n):
            if ia == ib:
                continue
            bb, xb, yb, zb, sb = boxes[ib]
            if ba != bb:
                continue
            # overlap widths per axis (boxes are half-open [x, x+s))
            def seg(a0, a1, b0, b1):
                return min(a1, b1) - max(a0, b0)
            ox = seg(xa, xa + sa, xb, xb + sb)
            oy = seg(ya, ya + sa, yb, yb + sb)
            oz = seg(za, za + sa, zb, zb + sb)
            d = None
            if ox > 0 and oy > 0:
                if za + sa == zb:
                    d = 0
                elif zb + sb == za:
                    d = 1
            if d is None and ox > 0 and oz > 0:
                if ya + sa == yb:
                    d = 2
                elif yb + sb == ya:
                    d = 3
            if d is None and oy > 0 and oz > 0:
                if xa + sa == xb:
                    d = 4
                elif xb + sb == xa:
                    d = 5
            if d is not None:
                edges.add((ia, ib, d))
    return edges


def graph_edges_set(g, d):
    """Extract (row, col, dir) of valid edges with vertices remapped to the
    oracle's dense ordering."""
    lvl = g.level(d)
    ne = int(lvl.n_edges)
    row = np.asarray(lvl.edge_row[:ne])
    col = np.asarray(lvl.edge_col[:ne])
    dr = np.asarray(lvl.edge_dir[:ne])
    # vertex padded position -> dense rank
    mask = np.asarray(lvl.node_mask)
    dense = np.cumsum(mask) - 1
    return set(
        (int(dense[r]), int(dense[c]), int(t)) for r, c, t in zip(row, col, dr)
    ), dense, mask


def check_level(o, g, d):
    verts = oracle_vertices(o, d)
    ref = oracle_edges(verts, o.spec.depth)
    got, dense, mask = graph_edges_set(g, d)
    # separate self loops
    got_loops = {e for e in got if e[2] == 6}
    got_edges = got - got_loops
    assert got_edges == ref, (
        f"level {d}: edges differ: extra={sorted(got_edges - ref)[:10]} "
        f"missing={sorted(ref - got_edges)[:10]}"
    )
    # self loops exactly on non-isolated vertices
    non_isolated = {e[0] for e in ref}
    assert got_loops == {(v, v, 6) for v in non_isolated}
    # vertex metadata
    lvl = g.level(d)
    n_nodes = int(lvl.n_nodes)
    assert n_nodes == len(verts)
    types = np.asarray(lvl.node_type)[mask]
    depthv = np.asarray(lvl.node_depthv)[mask]
    slots = np.asarray(lvl.node_slot)[mask]
    batches = np.asarray(lvl.node_batch)[mask]
    fd = o.spec.full_depth
    for k, (dd, slot, b, *_rest) in enumerate(verts):
        assert types[k] == dd - fd
        assert depthv[k] == dd
        assert slots[k] == slot
        assert batches[k] == b


def test_dual_graph_levels_single():
    o = make_octree(seed=0)
    g = build_dual_graph(o)
    assert not bool(np.asarray(o.overflow).any())
    for d in range(o.spec.full_depth, o.spec.depth + 1):
        assert not bool(np.asarray(g.level(d).overflow))
        check_level(o, g, d)


def test_dual_graph_batched():
    o1 = make_octree(seed=1, n=200)
    o2 = make_octree(seed=2, n=250)
    o = merge_octrees([o1, o2])
    g = build_dual_graph(o)
    for d in range(o.spec.full_depth, o.spec.depth + 1):
        check_level(o, g, d)


def test_edges_sorted_and_scaled():
    o = make_octree(seed=3)
    g = build_dual_graph(o)
    for d in range(o.spec.full_depth, o.spec.depth + 1):
        lvl = g.level(d)
        ne = int(lvl.n_edges)
        key = np.asarray(lvl.edge_row[:ne]) * 7 + np.asarray(lvl.edge_dir[:ne])
        assert (np.diff(key) >= 0).all()
        # scales: sum of scales over each (row, dir) slot is 1
        scale = np.asarray(lvl.edge_scale[:ne])
        sums = {}
        for k, s in zip(key, scale):
            sums[k] = sums.get(k, 0.0) + s
        assert np.allclose(list(sums.values()), 1.0)
        # padded edges have zero scale and sentinel row
        assert (np.asarray(lvl.edge_row[ne:]) == lvl.g_cap).all()
        assert (np.asarray(lvl.edge_scale[ne:]) == 0).all()
