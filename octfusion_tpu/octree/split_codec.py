"""Split-bit codecs between octrees and dense / per-node tensors
(`/root/reference/utils/util_dualoctree.py:199-273`).

``split_small``: the depth-(full_depth+1) child-occupancy pattern as a dense
``[B, S, S, S, 8]`` voxel grid (channels-last for TPU), values in {-1, +1} —
the lr diffusion stage's state.  ``split_large``: per-node 8-bit split
vectors at ``small_depth`` (the 3-stage variant's hr state).
"""

from __future__ import annotations

import jax.numpy as jnp

from .octree import Octree, OctreeSpec, create_full_octree


def octree2split_small(octree: Octree) -> jnp.ndarray:
    """-> [B, S, S, S, 8] in {-1, +1}, S = 2**full_depth
    (`util_dualoctree.py:199-211`)."""
    fd = octree.full_depth
    cap1 = octree.spec.node_caps[fd + 1]
    occ = octree.nempty_mask(fd + 1).astype(jnp.float32)
    occ8 = occ.reshape(cap1 // 8, 8)
    padded = octree.pad_nempty(occ8, fd)          # [cap_fd, 8]
    vox = octree.to_voxel(padded, fd)             # [B, S, S, S, 8]
    return 2.0 * vox - 1.0


def octree2split_large(octree: Octree, small_depth: int) -> jnp.ndarray:
    """-> [cap_sd, 8] in {-1, +1} over all nodes at ``small_depth``
    (`util_dualoctree.py:213-223`); padded rows are -1."""
    cap1 = octree.spec.node_caps[small_depth + 1]
    occ = octree.nempty_mask(small_depth + 1).astype(jnp.float32)
    occ8 = occ.reshape(cap1 // 8, 8)
    padded = octree.pad_nempty(occ8, small_depth)
    return 2.0 * padded - 1.0


def split2octree_small(split: jnp.ndarray, spec: OctreeSpec) -> Octree:
    """Grow a full_depth+2-deep topology from a dense split grid
    (`util_dualoctree.py:225-250`).  ``split``: [B, S, S, S, 8] with
    positive = occupied.  The returned octree has ``spec.depth`` static
    levels but is only populated to full_depth + 2."""
    fd = spec.full_depth
    occ = split > 0
    out = create_full_octree(spec)

    # level fd: split where any child occupied
    nonempty = jnp.any(occ, axis=-1)              # [B, S, S, S]
    label_fd = out.from_voxel(
        nonempty[..., None].astype(jnp.int32), fd
    )[:, 0]
    out = out.octree_split(label_fd, fd)
    out = out.octree_grow(fd + 1)

    # level fd+1: each node's own occupancy bit from its parent's channel
    x, y, z, b = out.xyzb(fd + 1)
    px, py, pz = x >> 1, y >> 1, z >> 1
    octant = ((x & 1) << 2) | ((y & 1) << 1) | (z & 1)
    bsz = spec.batch_size
    bits = occ[jnp.clip(b, 0, bsz - 1), px, py, pz, octant]
    label_p1 = (bits & out.node_mask(fd + 1)).astype(jnp.int32)
    out = out.octree_split(label_p1, fd + 1)
    out = out.octree_grow(fd + 2)
    return out


def split2octree_large(
    octree: Octree, split: jnp.ndarray, small_depth: int
) -> Octree:
    """Grow two more levels from per-node split vectors at ``small_depth``
    (`util_dualoctree.py:252-273`).  ``split``: [cap_sd, 8]."""
    occ = split > 0
    nonempty = jnp.any(occ, axis=-1) & octree.node_mask(small_depth)
    out = octree.octree_split(nonempty.astype(jnp.int32), small_depth)
    out = out.octree_grow(small_depth + 1)

    # nodes at small_depth+1 are children of the non-empty nodes in order;
    # child k of parent p sits at slot child[p]*8 + octant
    occ8 = out.depad_nempty(occ.astype(jnp.int32), small_depth)
    cap1 = out.spec.node_caps[small_depth + 1]
    label_p1 = occ8.reshape(-1)[:cap1]
    label_p1 = (label_p1 > 0) & out.node_mask(small_depth + 1)
    out = out.octree_split(label_p1.astype(jnp.int32), small_depth + 1)
    out = out.octree_grow(small_depth + 2)
    return out
