"""Fused Pallas graph convolution (the SURVEY §7.1.3 north-star kernel).

Consumes the descriptor plan from :mod:`graph_conv_plan`: for each
descriptor (one grid step) the kernel builds a ``[T, T]`` one-hot/scale
matrix on the VPU from a ``[T]`` offset vector, multiplies it with the
descriptor's source row tile of the VMEM-resident feature matrix on the
MXU, and accumulates into a ``[T, 7C]`` column-buffer scratch; on the last
descriptor of an output tile it applies the trailing ``[T, 7C] @ [7C, C']``
GEMM in-kernel.  No per-row gathers or scatters anywhere — the measured
~8 ns/row pointwise wall (PERF.md) is replaced by MXU work.

Reference computation: `modules.py:194-220` (gather + scatter_mean +
GEMM).  Numerical parity with ``graph_ops.graph_conv`` is tested in
``tests/test_pallas_conv.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...octree.dual_graph import N_EDGE_TYPE
from .graph_conv_plan import (DESC_BLOCK, ConvPlan,
                              build_conv_plan)  # noqa: F401 (re-export)


def _onehot(offs, scale, flag, t, dtype):
    """[T, T] matrix M with M[out, src] = scale; flag 0: offs[out] = src,
    flag 1: offs[src] = out."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    m_out = jnp.where(offs[:, None] == iota, scale[:, None], 0.0)
    m_src = jnp.where(offs[None, :] == iota_r, scale[None, :], 0.0)
    return jnp.where(flag == 1, m_src, m_out).astype(dtype)


def _fwd_kernel(
    # scalar prefetch
    tile_ref, src_ref, dir_ref, flag_ref, first_ref, last_ref, active_ref,
    # tensor inputs
    offs_ref, scale_ref, x_ref, w_ref,
    # outputs
    out_ref,
    # scratch
    col_ref,
    *, t, c, cout,
):
    base = pl.program_id(0) * DESC_BLOCK
    # per-tile descriptor runs are padded to DESC_BLOCK, so "first"/"last"
    # can only occur at sub-positions 0 / DESC_BLOCK-1

    @pl.when(first_ref[base] == 1)
    def _():
        col_ref[...] = jnp.zeros_like(col_ref)

    for k in range(DESC_BLOCK):
        g = base + k

        @pl.when(active_ref[g] == 1)
        def _(k=k, g=g):
            start = pl.multiple_of(src_ref[g] * t, t)
            src = x_ref[pl.ds(start, t), :]               # [T, C]
            m = _onehot(offs_ref[k], scale_ref[k], flag_ref[g], t, src.dtype)
            part = jnp.dot(m, src, preferred_element_type=jnp.float32)
            dstart = pl.multiple_of(dir_ref[g] * c, c)
            col_ref[:, pl.ds(dstart, c)] += part

    @pl.when(last_ref[base + DESC_BLOCK - 1] == 1)
    def _():
        out_ref[...] = jnp.dot(
            col_ref[...].astype(w_ref.dtype), w_ref[...],
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _col_kernel(
    tile_ref, src_ref, dir_ref, flag_ref, first_ref, last_ref, active_ref,
    offs_ref, scale_ref, x_ref,
    out_ref, col_ref, *, t, c,
):
    """Forward without the trailing GEMM: outputs the [G_pad, 7C] column
    buffer (used to recompute `col` for the dW backward)."""
    base = pl.program_id(0) * DESC_BLOCK

    @pl.when(first_ref[base] == 1)
    def _():
        col_ref[...] = jnp.zeros_like(col_ref)

    for k in range(DESC_BLOCK):
        g = base + k

        @pl.when(active_ref[g] == 1)
        def _(k=k, g=g):
            start = pl.multiple_of(src_ref[g] * t, t)
            src = x_ref[pl.ds(start, t), :]
            m = _onehot(offs_ref[k], scale_ref[k], flag_ref[g], t, src.dtype)
            part = jnp.dot(m, src, preferred_element_type=jnp.float32)
            dstart = pl.multiple_of(dir_ref[g] * c, c)
            col_ref[:, pl.ds(dstart, c)] += part

    @pl.when(last_ref[base + DESC_BLOCK - 1] == 1)
    def _():
        out_ref[...] = col_ref[...].astype(out_ref.dtype)


def _bwd_kernel(
    tile_ref, src_ref, dir_ref, flag_ref, first_ref, last_ref, active_ref,
    offs_ref, scale_ref, dout_ref, w_ref,
    out_ref, acc_ref, *, t, c, cout,
):
    """dx via the transpose plan: per descriptor, dcol_d = dout_tile @ W_d^T
    then dx_tile += M @ dcol_d.  Output tile = the plan's (col) tile."""
    base = pl.program_id(0) * DESC_BLOCK

    @pl.when(first_ref[base] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for k in range(DESC_BLOCK):
        g = base + k

        @pl.when(active_ref[g] == 1)
        def _(k=k, g=g):
            start = pl.multiple_of(src_ref[g] * t, t)
            dout = dout_ref[pl.ds(start, t), :]           # [T, Cout]
            wstart = pl.multiple_of(dir_ref[g] * c, c)
            wd = w_ref[pl.ds(wstart, c), :]               # [C, Cout]
            dcol = jax.lax.dot_general(
                dout, wd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dout.dtype)                           # [T, C]
            m = _onehot(offs_ref[k], scale_ref[k], flag_ref[g], t, dcol.dtype)
            acc_ref[...] += jnp.dot(
                m, dcol, preferred_element_type=jnp.float32
            )

    @pl.when(last_ref[base + DESC_BLOCK - 1] == 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _desc_specs(t):
    return [
        pl.BlockSpec((DESC_BLOCK, t), lambda g, *_: (g, 0)),   # offs
        pl.BlockSpec((DESC_BLOCK, t), lambda g, *_: (g, 0)),   # scale
    ]


def _run_fwd(plan: ConvPlan, x, w, interpret):
    t = plan.tile_t
    c = x.shape[1]
    cout = w.shape[1]
    xp = jnp.pad(x, ((0, plan.g_pad - x.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(plan.d_cap // DESC_BLOCK,),
        in_specs=_desc_specs(t) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t, cout), lambda g, tile, *_: (tile[g * DESC_BLOCK], 0)
        ),
        scratch_shapes=[pltpu.VMEM((t, N_EDGE_TYPE * c), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, t=t, c=c, cout=cout),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.g_pad, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        plan.f_tile, plan.f_src, plan.f_dir, plan.f_flag, plan.f_first,
        plan.f_last, plan.f_active, plan.f_offs, plan.f_scale, xp,
        w.astype(x.dtype),
    )
    return out[: x.shape[0]]


def _run_col(plan: ConvPlan, x, interpret):
    t = plan.tile_t
    c = x.shape[1]
    xp = jnp.pad(x, ((0, plan.g_pad - x.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(plan.d_cap // DESC_BLOCK,),
        in_specs=_desc_specs(t) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t, N_EDGE_TYPE * c), lambda g, tile, *_: (tile[g * DESC_BLOCK], 0)
        ),
        scratch_shapes=[pltpu.VMEM((t, N_EDGE_TYPE * c), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_col_kernel, t=t, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (plan.g_pad, N_EDGE_TYPE * c), x.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        plan.f_tile, plan.f_src, plan.f_dir, plan.f_flag, plan.f_first,
        plan.f_last, plan.f_active, plan.f_offs, plan.f_scale, xp,
    )


def _run_bwd(plan: ConvPlan, dout, w, c, interpret):
    t = plan.tile_t
    cout = w.shape[1]
    dp = jnp.pad(dout, ((0, plan.g_pad - dout.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(plan.d_cap // DESC_BLOCK,),
        in_specs=_desc_specs(t) + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t, c), lambda g, tile, *_: (tile[g * DESC_BLOCK], 0)
        ),
        scratch_shapes=[pltpu.VMEM((t, c), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, t=t, c=c, cout=cout),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.g_pad, c), dout.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        plan.b_tile, plan.b_src, plan.b_dir, plan.b_flag, plan.b_first,
        plan.b_last, plan.b_active, plan.b_offs, plan.b_scale, dp,
        w.astype(dout.dtype),
    )


def _plan_cotangents(plan: ConvPlan):
    import numpy as np

    def zero(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return np.zeros(leaf.shape, jax.dtypes.float0)

    return jax.tree_util.tree_map(zero, plan)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def graph_conv_fused(x, w, plan: ConvPlan, interpret: bool = False):
    """out[G, C'] = column_buffer(x, plan) @ w   (fused, differentiable).

    ``x: [G, C]`` (C a multiple of 128 for the compiled path — pad at the
    call site), ``w: [7C, C']``.
    """
    return _run_fwd(plan, x, w, interpret)


def _fwd_rule(x, w, plan, interpret):
    return _run_fwd(plan, x, w, interpret), (x, w, plan)


def _bwd_rule(interpret, res, dout):
    x, w, plan = res
    # dx = A^T (dout W^T) via the transpose plan (fused)
    dx = _run_bwd(plan, dout, w, x.shape[1], interpret)[: x.shape[0]]
    # dW = col^T dout with col recomputed by the column-buffer kernel
    col = _run_col(plan, x, interpret)
    dp = jnp.pad(dout, ((0, plan.g_pad - dout.shape[0]), (0, 0)))
    dw = jnp.einsum(
        "gk,go->ko", col.astype(jnp.float32), dp.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw, _plan_cotangents(plan)


graph_conv_fused.defvjp(_fwd_rule, _bwd_rule)


# ----------------------------------------------------------------------
# k-packed forward kernel (experimental; see graph_conv_plan.PackedConvPlan)
# ----------------------------------------------------------------------
from .graph_conv_plan import (PACK_BLOCK, K_PACK,  # noqa: E402,F401
                              PackedConvPlan, build_packed_conv_plan)


def _fwd_kernel_packed(
    # scalar prefetch
    tile_ref, dir_ref, first_ref, last_ref, active_ref, src_ref, flag_ref,
    # tensor inputs
    offs_ref, scale_ref, x_ref, w_ref,
    # outputs
    out_ref,
    # scratch
    col_ref, src_s, m_s,
    *, t, c, cout, k,
):
    base = pl.program_id(0) * PACK_BLOCK

    @pl.when(first_ref[base] == 1)
    def _():
        col_ref[...] = jnp.zeros_like(col_ref)

    for pk in range(PACK_BLOCK):
        p = base + pk

        @pl.when(active_ref[p] == 1)
        def _(pk=pk, p=p):
            for j in range(k):
                sj = pl.multiple_of(src_ref[p * k + j] * t, t)
                src_s[pl.ds(j * t, t), :] = x_ref[pl.ds(sj, t), :]
                m_s[:, pl.ds(j * t, t)] = _onehot(
                    offs_ref[pk, pl.ds(j * t, t)],
                    scale_ref[pk, pl.ds(j * t, t)],
                    flag_ref[p * k + j], t, x_ref.dtype,
                )
            part = jnp.dot(
                m_s[...], src_s[...], preferred_element_type=jnp.float32
            )
            dstart = pl.multiple_of(dir_ref[p] * c, c)
            col_ref[:, pl.ds(dstart, c)] += part

    @pl.when(last_ref[base + PACK_BLOCK - 1] == 1)
    def _():
        out_ref[...] = jnp.dot(
            col_ref[...].astype(w_ref.dtype), w_ref[...],
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _run_fwd_packed(plan: PackedConvPlan, x, w, interpret):
    t = plan.tile_t
    k = plan.k
    c = x.shape[1]
    cout = w.shape[1]
    xp = jnp.pad(x, ((0, plan.g_pad - x.shape[0]), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(plan.p_cap // PACK_BLOCK,),
        in_specs=[
            pl.BlockSpec((PACK_BLOCK, k * t), lambda g, *_: (g, 0)),
            pl.BlockSpec((PACK_BLOCK, k * t), lambda g, *_: (g, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t, cout), lambda g, tile, *_: (tile[g * PACK_BLOCK], 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((t, N_EDGE_TYPE * c), jnp.float32),
            pltpu.VMEM((k * t, c), x.dtype),
            pltpu.VMEM((t, k * t), x.dtype),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, t=t, c=c, cout=cout, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.g_pad, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        plan.f_tile, plan.f_dir, plan.f_first, plan.f_last, plan.f_active,
        plan.f_src, plan.f_flag, plan.f_offs, plan.f_scale, xp,
        w.astype(x.dtype),
    )
    return out[: x.shape[0]]


def graph_conv_packed(x, w, plan: PackedConvPlan, interpret: bool = False):
    """Forward-only k-packed fused conv (sampling path; differentiating
    through it is unsupported — use ConvPlan for training)."""
    return _run_fwd_packed(plan, x, w, interpret)
