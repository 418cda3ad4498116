"""Neural multi-level partition-of-unity implicit field (TPU formulation).

Equivalent of `/root/reference/models/networks/dualoctree_networks/mpu.py`:
each octree node at depths ``full_depth..d`` carries a plane ``(n, b)``; a
query point's SDF is the trilinear-weighted blend of ``n·Δx + b`` over the 8
corner nodes per depth, normalised by the blended weights.  The reference
compacts valid (point, corner) pairs and runs a sparse spmm; here every
query keeps its static ``8 × depths`` corner slots with masks — no
compaction, no dynamic shapes, one fused gather/FMA per depth.

The absolute value inside the linear basis uses a custom JVP with
``d|x|/dx = 1`` at 0 (`mpu.py:18-32`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..octree import morton
from ..octree.octree import Octree

# corner offset mask (`mpu.py:39-52`)
_CORNERS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]],
    np.float32,
)


@jax.custom_jvp
def abs_one(x):
    return jnp.abs(x)


@abs_one.defjvp
def _abs_one_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    sign = jnp.where(x < 0, -1.0, 1.0)
    return jnp.abs(x), sign * dx


def linear_basis(x):
    return 1.0 - abs_one(x)


def octree_corner_info(octree: Octree, depth: int, pos: jnp.ndarray,
                       pt_batch: jnp.ndarray, table=None):
    """For queries ``pos`` in [-1,1]^3: the 8 trilinear corner nodes at
    ``depth`` (`mpu.py:55-94`).

    ``table``: optional dense lookup (``octree.lookup_table(depth)``) that
    replaces the binary search with one gather — use for grid evaluation.

    Returns (idx [N,8] int32 node slot or -1, coordsf [N,8,3] offsets in the
    query's scale, weights [N,8] trilinear*depth-scale, valid [N,8])."""
    scale = 2**depth
    xyzf = (pos + 1.0) * (scale / 2.0) - 0.5
    xyzi = jnp.floor(xyzf)
    corners = xyzi[:, None, :] + jnp.asarray(_CORNERS)[None]      # [N,8,3]
    coordsf = xyzf[:, None, :] - corners                           # [N,8,3]

    inb = jnp.all((corners > -1) & (corners < scale), axis=-1)     # [N,8]
    ci = jnp.clip(corners, 0, scale - 1).astype(jnp.int32)
    key = morton.xyz2key(ci[..., 0], ci[..., 1], ci[..., 2], depth)
    qb = jnp.broadcast_to(pt_batch[:, None], key.shape)
    if table is not None:
        n = octree.batch_size * 8**depth
        addr = jnp.clip(qb, 0, octree.batch_size - 1) * (8**depth) + key
        idx = table[jnp.clip(addr, 0, n - 1)]
    else:
        idx = octree.search_key(key.reshape(-1), qb.reshape(-1), depth)
        idx = idx.reshape(key.shape)
    valid = inb & (idx >= 0)

    w = jnp.prod(linear_basis(coordsf), axis=-1)                   # [N,8]
    w = w * (depth**2 / 50.0)                                      # `mpu.py:89`
    coordsf = coordsf * (2.0 / scale)
    return idx, coordsf, w, valid


def mpu_eval(
    pos: jnp.ndarray,
    pt_batch: jnp.ndarray,
    reg_levels: Dict[int, jnp.ndarray],
    octree: Octree,
    full_depth: int,
    depth_end: int,
    corner_cache=None,
    tables=None,
):
    """Blend per-node planes into SDF values at ``pos``
    (`mpu.py:97-134`).

    ``reg_levels[dd]`` is the [node_caps[dd], 4] per-depth plane array
    (zeros on non-graph nodes).  Corners at depths < depth_end contribute
    only if the node is an octree leaf.  Returns (sdf [N], covered [N])."""
    n = pos.shape[0]
    num = jnp.zeros((n,), jnp.float32)
    den = jnp.zeros((n,), jnp.float32)
    covered = jnp.zeros((n,), bool)
    for dd in range(full_depth, depth_end + 1):
        if corner_cache is not None and dd in corner_cache:
            idx, coordsf, w, valid = corner_cache[dd]
        else:
            idx, coordsf, w, valid = octree_corner_info(
                octree, dd, pos, pt_batch,
                table=None if tables is None else tables.get(dd),
            )
        cap = octree.spec.node_caps[dd]
        idx_c = jnp.clip(idx, 0, cap - 1)
        if dd < depth_end:
            leaf = octree.child[dd][idx_c] < 0
            use = valid & leaf
        else:
            use = valid
            covered = valid.any(axis=-1)
        reg = reg_levels[dd][idx_c.reshape(-1)].reshape(n, 8, 4)
        fval = jnp.sum(reg[..., :3] * coordsf, axis=-1) + reg[..., 3]
        wm = jnp.where(use, w, 0.0)
        num = num + jnp.sum(wm * fval, axis=-1)
        den = den + jnp.sum(wm, axis=-1)
    return num / (den + 1e-8), covered


def neural_mpu(
    pos: jnp.ndarray,
    pt_batch: jnp.ndarray,
    reg_voxs: Dict[int, Dict[int, jnp.ndarray]],
    octree: Octree,
    full_depth: int,
    depth_stop: int,
    depth_end: int,
):
    """All-depth MPU evaluation (`mpu.py:137-152`): returns
    {d: (sdf, covered)} for d in depth_stop..depth_end, sharing the corner
    lookups across depths."""
    cache = {
        dd: octree_corner_info(octree, dd, pos, pt_batch)
        for dd in range(full_depth, depth_end + 1)
    }
    out = {}
    for d in range(depth_stop, depth_end + 1):
        out[d] = mpu_eval(
            pos, pt_batch, reg_voxs[d], octree, full_depth, d,
            corner_cache=cache,
        )
    return out
