"""Batched octrees as static-capacity struct-of-arrays pytrees.

This replaces the ``ocnn.octree.Octree`` object the reference builds on
(API surface catalogued in SURVEY.md §2.5).  Everything XLA sees has a
*static* shape: each depth ``d`` owns arrays padded to a fixed capacity
``spec.node_caps[d]`` with a valid prefix of traced length ``nnum[d]``.
Growing, splitting and merging are masked scatter/cumsum compactions, so the
whole lifecycle — including decode-time octree growth
(`/root/reference/models/networks/dualoctree_networks/graph_vae.py:202-210`)
— stays inside ``jit``.

Layout invariants (everything below relies on them):

* per depth, valid nodes occupy slots ``[0, nnum[d])``, sorted ascending by
  ``(batch, morton_key)``;
* for ``d > 0``, nodes appear in groups of 8 siblings: the children of the
  k-th non-empty node of depth ``d-1`` occupy slots ``[8k, 8k+8)``;
* ``child[d][i] >= 0`` iff node ``i`` is non-empty (has children / contains
  points at the finest depth), and its value is the rank of the node among
  the non-empty nodes of depth ``d``;
* padded slots carry ``key = INVALID_KEY``, ``batch = batch_size``,
  ``child = -1``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import struct

from . import morton
from .morton import INVALID_KEY


@dataclasses.dataclass(frozen=True)
class OctreeSpec:
    """Static shape descriptor for an :class:`Octree`.

    Hashable; a jitted function specialises on it.  ``node_caps[d]`` is the
    padded node capacity of depth ``d`` for the *whole batch*.
    """

    depth: int
    full_depth: int
    batch_size: int
    node_caps: Tuple[int, ...]

    def __post_init__(self):
        assert 0 < self.full_depth <= self.depth <= morton.MAX_DEPTH
        assert len(self.node_caps) == self.depth + 1
        for d in range(self.full_depth + 1):
            assert self.node_caps[d] == self.batch_size * 8**d, (
                f"full levels must have exact capacity, got {self.node_caps[d]} "
                f"at depth {d}"
            )
        for d in range(self.full_depth + 1, self.depth + 1):
            assert self.node_caps[d] % 8 == 0
            # children cannot outnumber 8x the parents (level-move helpers
            # rely on node_caps[d] // 8 <= node_caps[d-1])
            assert self.node_caps[d] <= 8 * self.node_caps[d - 1]

    @staticmethod
    def create(
        depth: int,
        full_depth: int,
        batch_size: int = 1,
        finest_cap_per_sample: int = 65536,
        decay: float = 4.0,
        caps_override: Optional[Sequence[int]] = None,
    ) -> "OctreeSpec":
        """Heuristic capacities: full levels exact, sparse levels decaying
        geometrically from ``finest_cap_per_sample`` (surface-like growth)."""
        caps = []
        for d in range(depth + 1):
            if d <= full_depth:
                caps.append(batch_size * 8**d)
            else:
                c = int(finest_cap_per_sample / decay ** (depth - d))
                # never go below the full-depth level size: levels just above
                # full_depth hold up to 8 children per (dense) parent and the
                # geometric decay badly underestimates them
                floor = min(8**d, 8**full_depth)
                c = min(8**d, max(c, floor, 64)) * batch_size
                caps.append(-(-c // 8) * 8)  # round up to a multiple of 8
        if caps_override is not None:
            for d, c in enumerate(caps_override):
                if c is not None:
                    caps[d] = c
        return OctreeSpec(depth, full_depth, batch_size, tuple(caps))

    def with_batch_size(self, batch_size: int) -> "OctreeSpec":
        per = [c // self.batch_size for c in self.node_caps]
        return OctreeSpec(
            self.depth, self.full_depth, batch_size,
            tuple(p * batch_size for p in per),
        )


class Octree(struct.PyTreeNode):
    """A batch of octrees, all arrays statically shaped.  See module docs."""

    spec: OctreeSpec = struct.field(pytree_node=False)
    # per-depth tuples, entry d has shape [node_caps[d]]
    keys: Tuple[jnp.ndarray, ...]      # int32 Morton codes
    batch: Tuple[jnp.ndarray, ...]     # int32 batch ids
    child: Tuple[jnp.ndarray, ...]     # int32, -1 = empty/leaf
    nnum: jnp.ndarray                  # [depth+1] int32 valid counts
    nnum_nempty: jnp.ndarray           # [depth+1] int32 non-empty counts
    # finest-level input signal (normal + displacement), zeros on empty nodes
    signal: jnp.ndarray                # [node_caps[depth], 4] float32
    # True where a depth needed more slots than node_caps provides; counts are
    # clamped to capacity in that case (trailing nodes dropped).  Pipelines
    # should check this and re-bucket / reject the sample.
    overflow: jnp.ndarray = struct.field(default=None)  # [depth+1] bool

    # ------------------------------------------------------------------
    # basic accessors
    # ------------------------------------------------------------------
    @property
    def depth(self) -> int:
        return self.spec.depth

    @property
    def full_depth(self) -> int:
        return self.spec.full_depth

    @property
    def batch_size(self) -> int:
        return self.spec.batch_size

    def node_mask(self, d: int) -> jnp.ndarray:
        """[cap_d] bool — valid (non-padding) nodes."""
        cap = self.spec.node_caps[d]
        return jnp.arange(cap, dtype=jnp.int32) < self.nnum[d]

    def nempty_mask(self, d: int) -> jnp.ndarray:
        """[cap_d] bool — valid and non-empty nodes
        (== ocnn ``nempty_mask``, `graph_vae.py:240`)."""
        return self.child[d] >= 0

    def batch_id(self, d: int) -> jnp.ndarray:
        return self.batch[d]

    def xyzb(self, d: int):
        """Decode keys of depth ``d`` to (x, y, z, b); padded slots give
        garbage coords and ``b == batch_size``."""
        x, y, z = morton.key2xyz(self.keys[d], d)
        return x, y, z, self.batch[d]

    def nonempty_position(self, d: int) -> jnp.ndarray:
        """[cap_d] int32 — position (slot) of the k-th non-empty node; padded
        entries (k >= nnum_nempty[d]) point at slot ``cap_d`` ... clamped to a
        safe gather index of 0 with the caller expected to mask.  Computed by
        inverting ``child``."""
        cap = self.spec.node_caps[d]
        pos = jnp.full((cap,), 0, dtype=jnp.int32)
        ne = self.nempty_mask(d)
        idx = jnp.where(ne, self.child[d], cap - 1)  # dump masked writes at end
        pos = pos.at[idx].set(
            jnp.where(ne, jnp.arange(cap, dtype=jnp.int32), 0),
            mode="drop",
        )
        return pos

    # ------------------------------------------------------------------
    # data movement helpers (ocnn octree_pad / octree_depad / octree2voxel)
    # ------------------------------------------------------------------
    def pad_nempty(self, data: jnp.ndarray, d: int) -> jnp.ndarray:
        """Data on non-empty nodes (compact, [cap_d, C]) -> all nodes at d,
        zeros on empty/padded (== ocnn ``octree_pad``)."""
        gathered = data[jnp.clip(self.child[d], 0, data.shape[0] - 1)]
        return jnp.where(self.nempty_mask(d)[:, None], gathered, 0)

    def depad_nempty(self, data: jnp.ndarray, d: int) -> jnp.ndarray:
        """Data on all nodes at d -> compact non-empty rows
        (== ocnn ``octree_depad``)."""
        pos = self.nonempty_position(d)
        k = jnp.arange(self.spec.node_caps[d], dtype=jnp.int32)
        valid = k < self.nnum_nempty[d]
        return jnp.where(valid[:, None], data[pos], 0)

    def to_voxel(self, data: jnp.ndarray, d: int) -> jnp.ndarray:
        """Scatter node data into a dense voxel grid [B, S, S, S, C]
        (== ocnn ``octree2voxel`` with nempty=False)."""
        size = 2**d
        x, y, z, b = self.xyzb(d)
        mask = self.node_mask(d)
        grid = jnp.zeros(
            (self.batch_size, size, size, size, data.shape[-1]), data.dtype
        )
        b = jnp.where(mask, b, self.batch_size)  # out-of-bounds -> dropped
        return grid.at[b, x, y, z].set(
            jnp.where(mask[:, None], data, 0), mode="drop"
        )

    def from_voxel(self, grid: jnp.ndarray, d: int) -> jnp.ndarray:
        """Gather voxel-grid values at node coordinates -> [cap_d, C]."""
        x, y, z, b = self.xyzb(d)
        mask = self.node_mask(d)
        vals = grid[jnp.clip(b, 0, self.batch_size - 1), x, y, z]
        return jnp.where(mask[:, None], vals, 0)

    # ------------------------------------------------------------------
    # key search (ocnn ``search_key``, used by the MPU, `mpu.py:70`)
    # ------------------------------------------------------------------
    def search_key(self, qkey: jnp.ndarray, qbatch: jnp.ndarray, d: int):
        """Find slots of (batch, key) queries at depth ``d``; -1 if absent.

        Keys are sorted by (batch, key) with padded slots sorting last, so a
        branch-free binary search over the pair order suffices.
        """
        from ..ops.search import searchsorted_pair

        idx = searchsorted_pair(self.batch[d], self.keys[d], qbatch, qkey)
        cap = self.spec.node_caps[d]
        idx_c = jnp.clip(idx, 0, cap - 1)
        found = (
            (idx < self.nnum[d])
            & (self.keys[d][idx_c] == qkey)
            & (self.batch[d][idx_c] == qbatch)
        )
        return jnp.where(found, idx_c, -1)

    def lookup_table(self, d: int) -> jnp.ndarray:
        """Dense (batch, morton) -> node-slot table, -1 where absent.

        [batch_size * 8^d] int32.  Turns key search into a single gather —
        the MPU grid evaluation does millions of corner lookups and
        pointwise gathers dominate on TPU, so one gather beats a ~15-step
        binary search by ~30x in touched rows.  Costs B*8^d ints, so use it
        for evaluation-time grids, not inside training losses."""
        n = self.batch_size * 8**d
        addr = self.batch[d] * (8**d) + self.keys[d]
        valid = self.node_mask(d)
        addr = jnp.where(valid, addr, n)
        cap = self.spec.node_caps[d]
        return jnp.full((n,), -1, jnp.int32).at[addr].set(
            jnp.where(valid, jnp.arange(cap, dtype=jnp.int32), -1),
            mode="drop",
        )

    # ------------------------------------------------------------------
    # growth (decode path)
    # ------------------------------------------------------------------
    def octree_split(self, label: jnp.ndarray, d: int) -> "Octree":
        """Set the non-empty flags of depth ``d`` from 0/1 ``label`` over all
        (padded) nodes; mirrors ocnn ``octree_split``."""
        valid = self.node_mask(d)
        lab = (label > 0) & valid
        ranks = jnp.cumsum(lab.astype(jnp.int32)) - 1
        new_child = jnp.where(lab, ranks, -1).astype(jnp.int32)
        child = list(self.child)
        child[d] = new_child
        nnum_nempty = self.nnum_nempty.at[d].set(jnp.sum(lab.astype(jnp.int32)))
        return self.replace(child=tuple(child), nnum_nempty=nnum_nempty)

    def octree_grow(self, d: int) -> "Octree":
        """Materialise depth ``d`` as the 8 children of every non-empty node
        of ``d-1``; mirrors ocnn ``octree_grow``."""
        cap = self.spec.node_caps[d]
        cap_p = self.spec.node_caps[d - 1]
        ne = self.nempty_mask(d - 1)
        blk = self.child[d - 1]  # rank among nonempty = child block index
        # scatter parent keys/batches into their child blocks
        tgt = jnp.where(ne, blk, cap // 8)  # invalid -> dropped
        pkeys = jnp.zeros((cap // 8,), jnp.int32).at[tgt].set(
            jnp.where(ne, self.keys[d - 1], 0), mode="drop"
        )
        pbatch = jnp.full((cap // 8,), self.batch_size, jnp.int32).at[tgt].set(
            jnp.where(ne, self.batch[d - 1], self.batch_size), mode="drop"
        )
        octant = jnp.arange(8, dtype=jnp.int32)
        new_keys = (pkeys[:, None] * 8 + octant[None, :]).reshape(-1)
        new_batch = jnp.broadcast_to(pbatch[:, None], (cap // 8, 8)).reshape(-1)
        n_new = 8 * self.nnum_nempty[d - 1]
        vmask = jnp.arange(cap, dtype=jnp.int32) < n_new
        new_keys = jnp.where(vmask, new_keys, INVALID_KEY)
        new_batch = jnp.where(vmask, new_batch, self.batch_size)
        keys = list(self.keys)
        batch = list(self.batch)
        child = list(self.child)
        keys[d] = new_keys.astype(jnp.int32)
        batch[d] = new_batch.astype(jnp.int32)
        child[d] = jnp.full((cap,), -1, jnp.int32)
        nnum = self.nnum.at[d].set(jnp.minimum(n_new, cap))
        nnum_nempty = self.nnum_nempty.at[d].set(0)
        overflow = self.overflow.at[d].set(self.overflow[d] | (n_new > cap))
        del cap_p
        return self.replace(
            keys=tuple(keys), batch=tuple(batch), child=tuple(child),
            nnum=nnum, nnum_nempty=nnum_nempty, overflow=overflow,
        )


# ----------------------------------------------------------------------
# constructors
# ----------------------------------------------------------------------
def _full_level_arrays(spec: OctreeSpec, d: int, nonempty: bool):
    n = spec.batch_size * 8**d
    idx = jnp.arange(n, dtype=jnp.int32)
    keys = idx % (8**d)
    batch = idx // (8**d)
    child = idx if nonempty else jnp.full((n,), -1, jnp.int32)
    return keys.astype(jnp.int32), batch.astype(jnp.int32), child.astype(jnp.int32)


def create_full_octree(spec: OctreeSpec) -> Octree:
    """A batch of octrees full up to ``full_depth`` with empty deeper levels
    (== `ldm_diffusion_util.py:318-325`).  All full-depth nodes are marked
    non-empty, awaiting ``octree_split``."""
    keys, batch, child = [], [], []
    nnum = []
    nnum_nempty = []
    for d in range(spec.depth + 1):
        if d <= spec.full_depth:
            k, b, c = _full_level_arrays(spec, d, nonempty=True)
            nnum.append(spec.batch_size * 8**d)
            nnum_nempty.append(spec.batch_size * 8**d)
        else:
            cap = spec.node_caps[d]
            k = jnp.full((cap,), INVALID_KEY, jnp.int32)
            b = jnp.full((cap,), spec.batch_size, jnp.int32)
            c = jnp.full((cap,), -1, jnp.int32)
            nnum.append(0)
            nnum_nempty.append(0)
        keys.append(k)
        batch.append(b)
        child.append(c)
    return Octree(
        spec=spec,
        keys=tuple(keys),
        batch=tuple(batch),
        child=tuple(child),
        nnum=jnp.array(nnum, jnp.int32),
        nnum_nempty=jnp.array(nnum_nempty, jnp.int32),
        signal=jnp.zeros((spec.node_caps[spec.depth], 4), jnp.float32),
        overflow=jnp.zeros((spec.depth + 1,), bool),
    )


def _unique_sorted(codes: jnp.ndarray, valid: jnp.ndarray, cap: int):
    """Compact the unique values of an ascending (masked) int array into a
    static-capacity array padded with INVALID_KEY.

    Returns (unique[cap], rank_per_input, n_unique)."""
    first = jnp.concatenate(
        [valid[:1], (codes[1:] != codes[:-1]) & valid[1:]]
    )
    first = first & valid
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n = jnp.sum(first.astype(jnp.int32))
    tgt = jnp.where(first, rank, cap)
    uniq = jnp.full((cap,), INVALID_KEY, jnp.int32).at[tgt].set(
        jnp.where(first, codes, INVALID_KEY), mode="drop"
    )
    return uniq, rank, n


def build_octree(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    spec: OctreeSpec,
    features: Optional[jnp.ndarray] = None,
) -> Octree:
    """Build a single-sample octree from points in [-1, 1]^3 (jittable).

    Equivalent of ``ocnn.Octree.build_octree`` + ``InputFeature('ND')``
    (`dual_octree.py:343-360`): the finest-level signal is the per-node
    averaged unit normal (3ch) plus the mean displacement of the contained
    points along that normal, measured from the node centre in node units
    (1ch).  Optional per-point ``features`` (e.g. colors,
    `dualoctree_snet.py:43-44`) are averaged per node and appended.
    """
    assert spec.batch_size == 1
    depth, full_depth = spec.depth, spec.full_depth
    size = 2**depth

    xyz = jnp.floor((points + 1.0) * (size / 2.0)).astype(jnp.int32)
    xyz = jnp.clip(xyz, 0, size - 1)
    code = morton.xyz2key(xyz[:, 0], xyz[:, 1], xyz[:, 2], depth)

    order = jnp.argsort(code)
    scode = code[order]
    snormals = normals[order]
    # fractional position inside the node, in [0,1)^3
    frac = (points + 1.0) * (size / 2.0) - xyz
    sfrac = frac[order]

    npts = points.shape[0]
    valid = jnp.ones((npts,), bool)

    # occupied (distinct) codes per depth, finest -> full_depth
    occ_keys = {}
    occ_n = {}
    occ_keys[depth], rank, occ_n[depth] = _unique_sorted(
        scode, valid, spec.node_caps[depth]
    )
    for d in range(depth - 1, full_depth - 1, -1):
        pcodes = jnp.where(
            occ_keys[d + 1] == INVALID_KEY, INVALID_KEY, occ_keys[d + 1] >> 3
        )
        pvalid = pcodes != INVALID_KEY
        occ_keys[d], _, occ_n[d] = _unique_sorted(
            pcodes, pvalid, spec.node_caps[d]
        )

    # per-occupied-node averaged signal at the finest depth
    cap_f = spec.node_caps[depth]
    ones = jnp.ones((npts, 1), jnp.float32)
    cnt = jnp.zeros((cap_f, 1), jnp.float32).at[rank].add(ones)
    nsum = jnp.zeros((cap_f, 3), jnp.float32).at[rank].add(snormals)
    fsum = jnp.zeros((cap_f, 3), jnp.float32).at[rank].add(sfrac)
    cnt = jnp.maximum(cnt, 1.0)
    navg = nsum / cnt
    navg = navg / jnp.maximum(jnp.linalg.norm(navg, axis=-1, keepdims=True), 1e-12)
    favg = fsum / cnt
    disp = jnp.sum(navg * (favg - 0.5), axis=-1, keepdims=True)
    occ_signal = jnp.concatenate([navg, disp], axis=-1)
    if features is not None:
        sfeat = features[order]
        fsum2 = jnp.zeros(
            (cap_f, features.shape[1]), jnp.float32
        ).at[rank].add(sfeat)
        occ_signal = jnp.concatenate([occ_signal, fsum2 / cnt], axis=-1)

    # assemble levels
    keys, batch, child = [], [], []
    nnum, nnum_nempty, overflow = [], [], []
    signal = None
    from ..ops.search import searchsorted_int

    for d in range(depth + 1):
        cap = spec.node_caps[d]
        if d < full_depth:
            k, b, c = _full_level_arrays(spec, d, nonempty=True)
            nn, ne = cap, cap
        else:
            if d == full_depth:
                k, b, _ = _full_level_arrays(spec, d, nonempty=True)
                nn = cap
            else:
                # children of occupied nodes at d-1
                pk = occ_keys[d - 1]
                pvalid = pk != INVALID_KEY
                octant = jnp.arange(8, dtype=jnp.int32)
                k = jnp.where(
                    pvalid[:, None], pk[:, None] * 8 + octant[None, :],
                    INVALID_KEY,
                ).reshape(-1)[:cap]
                nn = occ_n[d - 1] * 8
                b = jnp.where(
                    jnp.arange(cap, dtype=jnp.int32) < nn, 0, spec.batch_size
                ).astype(jnp.int32)
            # nonempty = membership in occupied set of depth d
            idx = searchsorted_int(occ_keys[d], k)
            idx_c = jnp.clip(idx, 0, cap - 1)
            hit = (occ_keys[d][idx_c] == k) & (k != INVALID_KEY)
            c = jnp.where(hit, idx_c, -1).astype(jnp.int32)
            ne = occ_n[d]
            if d == depth:
                # signal for all nodes: occupied get their average, rest 0
                sig = occ_signal[idx_c]
                signal = jnp.where(hit[:, None], sig, 0.0)
        overflow.append(jnp.asarray(nn, jnp.int32) > cap)
        nn = jnp.minimum(jnp.asarray(nn, jnp.int32), cap)
        ne = jnp.minimum(jnp.asarray(ne, jnp.int32), cap)
        vmask = jnp.arange(cap, dtype=jnp.int32) < nn
        k = jnp.where(vmask, k, INVALID_KEY).astype(jnp.int32)
        b = jnp.where(vmask, b, spec.batch_size).astype(jnp.int32)
        c = jnp.where(vmask, c, -1).astype(jnp.int32)
        keys.append(k)
        batch.append(b)
        child.append(c)
        nnum.append(nn)
        nnum_nempty.append(ne)

    return Octree(
        spec=spec,
        keys=tuple(keys),
        batch=tuple(batch),
        child=tuple(child),
        nnum=jnp.stack([jnp.asarray(n, jnp.int32) for n in nnum]),
        nnum_nempty=jnp.stack([jnp.asarray(n, jnp.int32) for n in nnum_nempty]),
        signal=signal,
        overflow=jnp.stack(overflow),
    )


def merge_octrees(octrees: Sequence[Octree]) -> Octree:
    """Concatenate single-sample octrees into one batch (jittable), matching
    ``ocnn.merge_octrees`` semantics (`octfusion_model_union.py:200-210`).

    Per depth, sample arrays are packed batch-major into the merged valid
    prefix; ``child`` ranks are offset by the cumulative non-empty counts.
    """
    b = len(octrees)
    spec0 = octrees[0].spec
    for o in octrees:
        assert o.spec == spec0 and o.spec.batch_size == 1
    mspec = spec0.with_batch_size(b)

    nnum = jnp.stack([o.nnum for o in octrees])            # [B, D+1]
    nnum_ne = jnp.stack([o.nnum_nempty for o in octrees])  # [B, D+1]
    off = jnp.concatenate(
        [jnp.zeros((1, spec0.depth + 1), jnp.int32), jnp.cumsum(nnum, 0)]
    )
    off_ne = jnp.concatenate(
        [jnp.zeros((1, spec0.depth + 1), jnp.int32), jnp.cumsum(nnum_ne, 0)]
    )

    keys, batch, child = [], [], []
    signal = None
    for d in range(spec0.depth + 1):
        cap1 = spec0.node_caps[d]
        capm = mspec.node_caps[d]
        k = jnp.stack([o.keys[d] for o in octrees])    # [B, cap1]
        bt = jnp.stack([o.batch[d] for o in octrees])
        c = jnp.stack([o.child[d] for o in octrees])
        i = jnp.arange(cap1, dtype=jnp.int32)[None, :]
        valid = i < nnum[:, d][:, None]
        tgt = jnp.where(valid, off[:-1, d][:, None] + i, capm)
        mk = jnp.full((capm,), INVALID_KEY, jnp.int32).at[tgt.reshape(-1)].set(
            jnp.where(valid, k, INVALID_KEY).reshape(-1), mode="drop"
        )
        mb = jnp.full((capm,), b, jnp.int32).at[tgt.reshape(-1)].set(
            jnp.where(
                valid, jnp.arange(b, dtype=jnp.int32)[:, None], b
            ).reshape(-1),
            mode="drop",
        )
        del bt
        coff = c + off_ne[:-1, d][:, None]
        mc = jnp.full((capm,), -1, jnp.int32).at[tgt.reshape(-1)].set(
            jnp.where(valid & (c >= 0), coff, -1).reshape(-1), mode="drop"
        )
        keys.append(mk)
        batch.append(mb)
        child.append(mc)
        if d == spec0.depth:
            sig = jnp.stack([o.signal for o in octrees])  # [B, cap1, C]
            cs = sig.shape[-1]
            signal = jnp.zeros((capm, cs), jnp.float32).at[
                tgt.reshape(-1)
            ].set(
                jnp.where(valid[..., None], sig, 0.0).reshape(-1, cs),
                mode="drop",
            )

    caps_arr = jnp.asarray(mspec.node_caps, jnp.int32)
    tot = jnp.sum(nnum, 0)
    overflow = jnp.any(
        jnp.stack([o.overflow for o in octrees]), axis=0
    ) | (tot > caps_arr)
    return Octree(
        spec=mspec,
        keys=tuple(keys),
        batch=tuple(batch),
        child=tuple(child),
        nnum=jnp.minimum(tot, caps_arr),
        nnum_nempty=jnp.sum(nnum_ne, 0),
        signal=signal,
        overflow=overflow,
    )
