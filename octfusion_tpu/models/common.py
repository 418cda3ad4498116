"""Shared solver plumbing: on-device batch -> octree/graph prep, train state.

The reference does per-batch ``points2octree`` + ``merge_octrees`` on device
(`/root/reference/models/octfusion_model_union.py:200-221`); here the whole
prep — per-sample octree build, merge, dual-graph construction — is jittable
index math executed on the accelerator.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..octree.dual_graph import build_dual_graph
from ..octree.octree import Octree, OctreeSpec, build_octree, merge_octrees


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any = None


def batch_to_octree(
    points: jnp.ndarray,       # [B, N, 3]
    normals: jnp.ndarray,      # [B, N, 3]
    spec_single: OctreeSpec,
    features: Optional[jnp.ndarray] = None,   # [B, N, F] e.g. colors
) -> Octree:
    octs = [
        build_octree(
            points[i], normals[i], spec_single,
            None if features is None else features[i],
        )
        for i in range(points.shape[0])
    ]
    return merge_octrees(octs) if len(octs) > 1 else octs[0]


def batch_to_graph(
    points, normals, spec_single: OctreeSpec, edge_factor: int = 9,
    up_to: Optional[int] = None, features=None,
):
    octree = batch_to_octree(points, normals, spec_single, features)
    graph = build_dual_graph(octree, edge_factor, up_to=up_to)
    return octree, graph


# Jitted variants — on the tunnelled axon TPU every eager op is a network
# round-trip, so even "setup" paths must compile to single XLA programs.
batch_to_octree_jit = jax.jit(batch_to_octree, static_argnames=("spec_single",))
batch_to_graph_jit = jax.jit(
    batch_to_graph, static_argnames=("spec_single", "edge_factor", "up_to")
)


def flatten_pos(pos: jnp.ndarray):
    """[B, M, 3] query points -> ([B*M, 3], batch ids [B*M])."""
    b, m, _ = pos.shape
    flat = pos.reshape(b * m, 3)
    pb = jnp.repeat(jnp.arange(b, dtype=jnp.int32), m)
    return flat, pb
