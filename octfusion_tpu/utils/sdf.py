"""Dense SDF grid evaluation of the MPU + mesh export
(`/root/reference/utils/util_dualoctree.py:99-118` calc_sdf; export at
`models/octfusion_model_union.py:425-468`)."""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..octree.octree import Octree
from ..ops import mpu as mpu_ops
from . import mesh as mesh_utils


def grid_points(size: int, bbmin: float, bbmax: float) -> np.ndarray:
    coord = np.arange(size, dtype=np.float32)
    g = np.stack(np.meshgrid(coord, coord, coord, indexing="ij"), -1)
    g = g.reshape(-1, 3) * ((bbmax - bbmin) / size) + bbmin
    return g


@partial(jax.jit, static_argnames=("full_depth", "depth_end"))
def _mpu_chunk(pos, pb, reg_levels, octree, full_depth, depth_end):
    return mpu_ops.mpu_eval(pos, pb, reg_levels, octree, full_depth, depth_end)[0]


def calc_sdf(
    reg_levels: Dict[int, jnp.ndarray],
    octree: Octree,
    full_depth: int,
    depth_end: int,
    batch_size: int = 1,
    size: int = 256,
    bbmin: float = -0.9,
    bbmax: float = 0.9,
    max_batch: int = 64**3,
) -> np.ndarray:
    """[B, size, size, size] SDF values evaluated in chunks on device."""
    samples = grid_points(size, bbmin, bbmax)
    num = samples.shape[0]
    out = np.zeros((batch_size, num), np.float32)
    for b in range(batch_size):
        for head in range(0, num, max_batch):
            tail = min(head + max_batch, num)
            chunk = samples[head:tail]
            pad = max_batch - (tail - head)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
            pb = jnp.full((max_batch,), b, jnp.int32)
            sdf = _mpu_chunk(
                jnp.asarray(chunk), pb, reg_levels, octree, full_depth,
                depth_end,
            )
            out[b, head:tail] = np.asarray(sdf)[: tail - head]
    return out.reshape(batch_size, size, size, size)


def export_meshes(
    sdfs: np.ndarray,
    save_paths,
    level: float = 0.0,
    bbmin: float = -0.9,
    bbmax: float = 0.9,
    mesh_scale: float = 1.0,
):
    """Marching-tetrahedra extraction + OBJ export per sample
    (`octfusion_model_union.py:435-468`)."""
    size = sdfs.shape[1]
    written = []
    for i, path in enumerate(save_paths):
        verts, faces = mesh_utils.marching_tetrahedra(sdfs[i], level)
        if len(verts) == 0:
            written.append(None)
            continue
        verts = verts * ((bbmax - bbmin) / size) + bbmin
        verts = verts * mesh_scale
        mesh_utils.save_obj(path, verts, faces)
        written.append(path)
    return written
