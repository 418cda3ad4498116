"""Pallas TPU kernel: fused bidirectional nearest-neighbour distances.

The 1-NNA/COV/MMD evaluation needs brute-force Chamfer between every
(sample, reference) pair — O(S·R·P²) distances (the reference uses a CUDA
kernel with shared-memory tiling, `nndistance.cu`).  The XLA formulation
materialises the [N, M] squared-distance matrix in HBM per pair; this kernel
tiles it through VMEM and reduces both row- and column-minima in place, so
HBM traffic is O(N + M) instead of O(N·M).

Grid: (B, N/T, M/T), row-major (j innermost).  dl[b, i-tile] accumulates the
min over j; dr[b, j-tile] accumulates over i (output blocks are revisited —
initialised on first visit, min-merged after).  Minima are kept as
[T/128, 128] lanes to satisfy TPU tiling; the caller reshapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
_LANES = 128
_SUB = TILE // _LANES  # 8


def _kernel(a_ref, b_ref, dl_ref, dr_ref):
    i = pl.program_id(1)
    j = pl.program_id(2)

    a = a_ref[0]                     # [T, 3]
    b = b_ref[0]                     # [T, 3]
    aa = jnp.sum(a * a, axis=-1, keepdims=True)           # [T, 1]
    bb = jnp.sum(b * b, axis=-1, keepdims=True)           # [T, 1]
    ab = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = jnp.maximum(aa - 2.0 * ab + bb.T, 0.0)            # [T, T]

    row_min = jnp.min(d, axis=1).reshape(_SUB, _LANES)
    col_min = jnp.min(d, axis=0).reshape(_SUB, _LANES)

    @pl.when(j == 0)
    def _():
        dl_ref[0] = row_min

    @pl.when(j != 0)
    def _():
        dl_ref[0] = jnp.minimum(dl_ref[0], row_min)

    @pl.when(i == 0)
    def _():
        dr_ref[0] = col_min

    @pl.when(i != 0)
    def _():
        dr_ref[0] = jnp.minimum(dr_ref[0], col_min)


def _pad_points(x, tile):
    n = x.shape[1]
    nn = -(-n // tile) * tile
    if nn != n:
        # pad far away so padded points never win a min
        pad = jnp.full((x.shape[0], nn - n, 3), 1e6, x.dtype)
        x = jnp.concatenate([x, pad], axis=1)
    return x, n


@partial(jax.jit, static_argnames=("interpret",))
def chamfer_pallas(a, b, interpret: bool = False):
    """a [B,N,3], b [B,M,3] float32 -> (dl [B,N], dr [B,M]) squared NN
    distances (== metrics.distances.chamfer)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    ap, n = _pad_points(a, TILE)
    bp, m = _pad_points(b, TILE)
    bsz, nn = ap.shape[0], ap.shape[1]
    mm = bp.shape[1]
    dl, dr = pl.pallas_call(
        _kernel,
        grid=(bsz, nn // TILE, mm // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, 3), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 3), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _SUB, _LANES), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANES), lambda bi, i, j: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, nn // _LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((bsz, mm // _LANES, _LANES), jnp.float32),
        ),
        interpret=interpret,
    )(ap, bp)
    return dl.reshape(bsz, nn)[:, :n], dr.reshape(bsz, mm)[:, :m]
