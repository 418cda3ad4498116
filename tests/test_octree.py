"""Octree core tests: morton codes, build-from-points, merge, growth.

Oracles are independent numpy brute-force implementations (the reference has
no test suite; SURVEY.md §4 calls for tiny deterministic octrees as
fixtures)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octfusion_tpu.octree import morton
from octfusion_tpu.octree.octree import (
    Octree,
    OctreeSpec,
    build_octree,
    create_full_octree,
    merge_octrees,
)
from octfusion_tpu.ops.search import searchsorted_pair


def brute_morton(x, y, z, depth):
    out = 0
    for i in range(depth):
        out |= ((x >> i) & 1) << (3 * i + 2)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i)
    return out


def test_morton_roundtrip():
    rng = np.random.RandomState(0)
    for depth in [1, 3, 6, 10]:
        n = 64
        xyz = rng.randint(0, 2**depth, size=(n, 3)).astype(np.int32)
        key = morton.xyz2key(
            jnp.asarray(xyz[:, 0]), jnp.asarray(xyz[:, 1]), jnp.asarray(xyz[:, 2]),
            depth,
        )
        expect = np.array(
            [brute_morton(int(a), int(b), int(c), depth) for a, b, c in xyz]
        )
        np.testing.assert_array_equal(np.asarray(key), expect)
        x, y, z = morton.key2xyz(key, depth)
        np.testing.assert_array_equal(np.asarray(x), xyz[:, 0])
        np.testing.assert_array_equal(np.asarray(y), xyz[:, 1])
        np.testing.assert_array_equal(np.asarray(z), xyz[:, 2])


def test_morton_order_is_parent_major():
    # key of a child = parent_key * 8 + octant
    depth = 4
    x, y, z = 5, 3, 9
    k = int(morton.xyz2key(jnp.array([x]), jnp.array([y]), jnp.array([z]), depth)[0])
    kp = int(
        morton.xyz2key(
            jnp.array([x // 2]), jnp.array([y // 2]), jnp.array([z // 2]), depth - 1
        )[0]
    )
    assert k // 8 == kp
    assert k % 8 == ((x & 1) << 2) | ((y & 1) << 1) | (z & 1)


def small_spec(depth=4, full_depth=2, batch_size=1):
    # decay=1: uniform random test points don't have the surface-like 4x
    # per-level sparsity of real shapes, so give every level full headroom.
    return OctreeSpec.create(
        depth, full_depth, batch_size, finest_cap_per_sample=2048, decay=1.0
    )


def ref_build(points, depth, full_depth):
    """Brute-force octree build: returns dict depth -> sorted node key list
    and per-depth occupied key sets."""
    size = 2**depth
    xyz = np.clip(np.floor((points + 1.0) * size / 2.0).astype(np.int64), 0, size - 1)
    codes = set(
        brute_morton(int(a), int(b), int(c), depth) for a, b, c in xyz
    )
    occ = {depth: sorted(codes)}
    for d in range(depth - 1, -1, -1):
        occ[d] = sorted(set(k >> 3 for k in occ[d + 1]))
    nodes = {}
    for d in range(depth + 1):
        if d <= full_depth:
            nodes[d] = list(range(8**d))
        else:
            nodes[d] = sorted(p * 8 + j for p in occ[d - 1] for j in range(8))
    return nodes, occ


def test_build_octree_structure():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.95, 0.95, size=(200, 3)).astype(np.float32)
    nrm = rng.normal(size=(200, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    spec = small_spec()
    oct_ = jax.jit(build_octree, static_argnums=2)(
        jnp.asarray(pts), jnp.asarray(nrm), spec
    )
    nodes, occ = ref_build(pts, spec.depth, spec.full_depth)

    for d in range(spec.depth + 1):
        nn = int(oct_.nnum[d])
        assert nn == len(nodes[d]), f"depth {d}"
        got = np.asarray(oct_.keys[d][:nn])
        np.testing.assert_array_equal(got, np.array(nodes[d]))
        # child flags: >= 0 iff occupied, values are compact ranks
        child = np.asarray(oct_.child[d][:nn])
        occ_set = set(occ[d]) if d > spec.full_depth or d == spec.full_depth else None
        if d < spec.full_depth:
            np.testing.assert_array_equal(child, np.arange(nn))
        else:
            expect_ne = np.array([k in set(occ[d]) for k in nodes[d]])
            np.testing.assert_array_equal(child >= 0, expect_ne)
            np.testing.assert_array_equal(
                child[expect_ne], np.arange(expect_ne.sum())
            )
        assert int(oct_.nnum_nempty[d]) == (
            len(occ[d]) if d >= spec.full_depth else nn
        )
        # sibling-block invariant
        if d > spec.full_depth:
            keys_blocks = got.reshape(-1, 8)
            np.testing.assert_array_equal(
                keys_blocks % 8,
                np.tile(np.arange(8), (keys_blocks.shape[0], 1)),
            )


def test_build_octree_signal():
    # all points in one node with identical normals -> signal = [n, dot(n, mu-0.5)]
    spec = small_spec(depth=3, full_depth=1)
    pts = np.array([[0.1, 0.1, 0.1], [0.12, 0.14, 0.11]], np.float32)
    nrm = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (2, 1))
    o = build_octree(jnp.asarray(pts), jnp.asarray(nrm), spec)
    d = spec.depth
    ne = np.asarray(o.nempty_mask(d))
    sig = np.asarray(o.signal)[ne]
    assert sig.shape[0] == 1
    np.testing.assert_allclose(sig[0, :3], [0, 0, 1], atol=1e-6)
    size = 2**d
    frac = (pts + 1.0) * size / 2.0
    frac -= np.floor(frac)
    expect_d = (frac.mean(0) - 0.5)[2]
    np.testing.assert_allclose(sig[0, 3], expect_d, rtol=1e-5)


def test_merge_octrees():
    rng = np.random.RandomState(2)
    spec = small_spec()
    octs = []
    all_nodes = []
    for i in range(3):
        pts = rng.uniform(-0.9, 0.9, size=(100, 3)).astype(np.float32)
        nrm = rng.normal(size=(100, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        octs.append(build_octree(jnp.asarray(pts), jnp.asarray(nrm), spec))
        all_nodes.append(ref_build(pts, spec.depth, spec.full_depth)[0])
    merged = merge_octrees(octs)
    assert merged.batch_size == 3
    for d in range(spec.depth + 1):
        nn = int(merged.nnum[d])
        assert nn == sum(len(n[d]) for n in all_nodes)
        keys = np.asarray(merged.keys[d][:nn])
        bt = np.asarray(merged.batch[d][:nn])
        expect_keys = np.concatenate([np.array(n[d]) for n in all_nodes])
        expect_b = np.concatenate(
            [np.full(len(n[d]), i) for i, n in enumerate(all_nodes)]
        )
        np.testing.assert_array_equal(keys, expect_keys)
        np.testing.assert_array_equal(bt, expect_b)
        # child ranks remain compact & consistent
        child = np.asarray(merged.child[d][:nn])
        ne = child >= 0
        np.testing.assert_array_equal(child[ne], np.arange(ne.sum()))


def test_search_key():
    rng = np.random.RandomState(3)
    spec = small_spec()
    pts = rng.uniform(-0.9, 0.9, size=(150, 3)).astype(np.float32)
    nrm = np.ones((150, 3), np.float32)
    o = build_octree(jnp.asarray(pts), jnp.asarray(nrm), spec)
    d = spec.depth
    nn = int(o.nnum[d])
    keys = np.asarray(o.keys[d][:nn])
    # present queries
    q = jnp.asarray(keys[::7])
    qb = jnp.zeros_like(q)
    idx = np.asarray(o.search_key(q, qb, d))
    np.testing.assert_array_equal(keys[idx], keys[::7])
    # absent queries
    absent = jnp.asarray(np.setdiff1d(np.arange(50), keys)[:10].astype(np.int32))
    idx2 = np.asarray(o.search_key(absent, jnp.zeros_like(absent), d))
    assert (idx2 == -1).all()
    # wrong batch
    idx3 = np.asarray(o.search_key(q, qb + 5, d))
    assert (idx3 == -1).all()


def test_searchsorted_pair_matches_numpy():
    rng = np.random.RandomState(4)
    hi = np.sort(rng.randint(0, 5, size=37))
    lo = np.zeros(37, np.int32)
    for i in range(37):  # make (hi, lo) lexicographically sorted
        lo[i] = rng.randint(0, 100)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order].astype(np.int32), lo[order].astype(np.int32)
    packed = hi.astype(np.int64) * 1000 + lo
    qh = rng.randint(0, 6, size=50).astype(np.int32)
    ql = rng.randint(0, 100, size=50).astype(np.int32)
    qpacked = qh.astype(np.int64) * 1000 + ql
    got = np.asarray(
        searchsorted_pair(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(qh), jnp.asarray(ql))
    )
    expect = np.searchsorted(packed, qpacked, side="left")
    np.testing.assert_array_equal(got, expect)


def test_grow_split_roundtrip():
    """create_full_octree + split with a built octree's nempty masks must
    reproduce that octree's topology (the decode-path contract,
    `graph_vae.py:236-244`)."""
    rng = np.random.RandomState(5)
    spec = small_spec()
    pts = rng.uniform(-0.9, 0.9, size=(120, 3)).astype(np.float32)
    nrm = np.ones((120, 3), np.float32)
    src = build_octree(jnp.asarray(pts), jnp.asarray(nrm), spec)

    out = create_full_octree(spec)
    for d in range(spec.full_depth, spec.depth):
        label = src.nempty_mask(d).astype(jnp.int32)
        out = out.octree_split(label, d)
        out = out.octree_grow(d + 1)
    for d in range(spec.depth + 1):
        nn = int(src.nnum[d])
        assert int(out.nnum[d]) == nn
        np.testing.assert_array_equal(
            np.asarray(out.keys[d][:nn]), np.asarray(src.keys[d][:nn])
        )


def test_overflow_flagged():
    """Capacity overflow must be reported, not silent (found by driving a
    5000-point sphere through a tight spec)."""
    rng = np.random.RandomState(7)
    v = rng.normal(size=(2000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (0.7 * v).astype(np.float32)
    spec = OctreeSpec.create(
        4, 2, 1, finest_cap_per_sample=4096,
        caps_override=[None, None, None, 64, 512],
    )
    o = build_octree(jnp.asarray(pts), jnp.asarray(v.astype(np.float32)), spec)
    ov = np.asarray(o.overflow)
    assert ov.any()
    # counts stay clamped to capacity
    for d in range(spec.depth + 1):
        assert int(o.nnum[d]) <= spec.node_caps[d]


def test_pad_depad_voxel():
    rng = np.random.RandomState(6)
    spec = small_spec(depth=4, full_depth=2)
    pts = rng.uniform(-0.9, 0.9, size=(60, 3)).astype(np.float32)
    nrm = np.ones((60, 3), np.float32)
    o = build_octree(jnp.asarray(pts), jnp.asarray(nrm), spec)
    d = 3
    ne = int(o.nnum_nempty[d])
    cap = spec.node_caps[d]
    data = jnp.asarray(rng.normal(size=(cap, 5)).astype(np.float32))
    data = data.at[ne:].set(0)
    padded = o.pad_nempty(data, d)
    # row i = data[child[i]] where nonempty
    child = np.asarray(o.child[d])
    nem = np.asarray(o.nempty_mask(d))
    np.testing.assert_allclose(
        np.asarray(padded)[nem], np.asarray(data)[child[nem]]
    )
    assert np.abs(np.asarray(padded)[~nem]).sum() == 0
    # depad inverts
    back = o.depad_nempty(padded, d)
    np.testing.assert_allclose(np.asarray(back)[:ne], np.asarray(data)[:ne])

    vox = o.to_voxel(padded, d)
    assert vox.shape == (1, 8, 8, 8, 5)
    got = o.from_voxel(vox, d)
    nn = int(o.nnum[d])
    np.testing.assert_allclose(np.asarray(got)[:nn], np.asarray(padded)[:nn])
