"""Descriptor-plan precompute for the fused Pallas graph convolution.

The graph conv gathers neighbour features per edge, segment-means them into
a ``[G, 7, C]`` column buffer and multiplies by ``W [7C, C']``
(`/root/reference/models/networks/modules.py:194-220`).  On TPU the
per-edge gather/scatter runs at a fixed ~8 ns/row regardless of width
(PERF.md) — the wall for the whole hr sampling loop.

This module converts a :class:`GraphLevel`'s (static, per-shape) edge list
into a *descriptor plan*: the rows are tiled by ``T``; each descriptor is a
(out-tile, dir, src-tile) block whose edges form a partial permutation —
at most one edge per out row (out-major) or per src row (src-major).  The
kernel then builds the block's one-hot matrix on the fly from a ``[T]``
offset vector and hits the MXU with ``[T, T] @ [T, C]`` — gathers become
matmuls.  Edges whose (row, dir) has multiple same-tile neighbours (coarse
leaves facing finer nodes — scatter-*mean* slots with count up to 4^k) go
to extra "layers"; each (tile, dir, src-tile) group is packed out-major or
src-major, whichever needs fewer layers.

The plan depends only on the graph topology, so it is built once per shape
and reused by every conv of every sampling step (200 steps x ~20 convs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ...octree.dual_graph import GraphLevel, N_EDGE_TYPE

TILE = 128
MAX_LAYERS = 64  # key-packing bound for slot layers (4^k in theory)
DESC_BLOCK = 32  # descriptors per kernel grid step (amortises per-step DMA)


def _final_cap(d_cap: int, r_tiles: int) -> int:
    """Static descriptor-array length = the requested capacity rounded to
    DESC_BLOCK.  ``desc_factor`` budgets the PADDED per-tile usage
    (descriptors + round-to-DESC_BLOCK run padding): measured depth-8
    shapes use <=43 padded slots/tile at T=128, so the default 56 keeps
    ~1.3x headroom.  The kernel grid iterates d_final/DESC_BLOCK steps, so
    a loose bound costs real time (the old worst-case formula made 70% of
    grid steps pure padding: ~2x slower convs).  Exceeding the budget sets
    ``overflow`` (checked by callers), never corrupts silently-in-bounds
    slots."""
    del r_tiles
    return -(-d_cap // DESC_BLOCK) * DESC_BLOCK


class ConvPlan(struct.PyTreeNode):
    """Descriptor plan for one GraphLevel (forward + transpose)."""

    tile_t: int = struct.field(pytree_node=False)   # T
    n_tiles: int = struct.field(pytree_node=False)  # R
    g_pad: int = struct.field(pytree_node=False)    # R*T
    d_cap: int = struct.field(pytree_node=False)
    # forward descriptors, sorted by out tile (= row tile)
    f_tile: jnp.ndarray    # int32 [D] out (row) tile
    f_src: jnp.ndarray     # int32 [D] src (col) tile
    f_dir: jnp.ndarray     # int32 [D]
    f_flag: jnp.ndarray    # int32 [D] 0: offs[out_l]=src_l, 1: offs[src_l]=out_l
    f_first: jnp.ndarray   # int32 [D] first descriptor of its out tile
    f_last: jnp.ndarray    # int32 [D]
    f_offs: jnp.ndarray    # int32 [D, T], -1 = empty
    f_scale: jnp.ndarray   # f32 [D, T]
    # transpose descriptors (out tile = col tile), for the backward dx pass
    b_tile: jnp.ndarray
    b_src: jnp.ndarray
    b_dir: jnp.ndarray
    b_flag: jnp.ndarray
    b_first: jnp.ndarray
    b_last: jnp.ndarray
    b_offs: jnp.ndarray
    b_scale: jnp.ndarray
    f_active: jnp.ndarray  # int32 [D] 1 = real descriptor (pads skipped)
    b_active: jnp.ndarray
    overflow: jnp.ndarray  # bool — descriptor capacity exceeded


def _layer_slots(gkey, minor, valid):
    """Position of each edge within its (gkey, minor) run after a stable
    lexsort by (gkey, minor) — the packing "layer".  All int32 (x64 is
    disabled); the composite sort is two stable passes (radix style).
    Returns (order, slot_in_sorted_order)."""
    big = jnp.iinfo(jnp.int32).max
    gk = jnp.where(valid, gkey, big)
    mn = jnp.where(valid, minor, big)
    o1 = jnp.argsort(mn, stable=True)
    o2 = jnp.argsort(gk[o1], stable=True)
    order = o1[o2]
    gs = gk[order]
    ms = mn[order]
    idx = jnp.arange(gs.shape[0], dtype=jnp.int32)
    new = jnp.concatenate(
        [jnp.ones((1,), bool), (gs[1:] != gs[:-1]) | (ms[1:] != ms[:-1])]
    )
    start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new, idx, -1)
    )
    return order, idx - start


def _segment_max(values, segs, num):
    return jnp.zeros((num,), values.dtype).at[segs].max(values, mode="drop")


def _make_descs(r, c, d, s, valid, g, t, r_tiles, d_cap):
    """Shared descriptor creation for both layouts: returns the compact,
    (tile, dir, src, layer)-sorted descriptor attribute arrays
    (tile, src, dir, flag, offs [n,t], scale [n,t], n_real, overflow)."""
    e = r.shape[0]
    it = jnp.where(valid, r // t, r_tiles - 1).astype(jnp.int32)
    jt = jnp.where(valid, c // t, 0).astype(jnp.int32)
    dd = jnp.where(valid, d, 0).astype(jnp.int32)
    # group key (out-tile, dir, src-tile); fits int32 up to R ~ 1.7k
    gkey = (it * N_EDGE_TYPE + dd) * r_tiles + jt

    # layer index under both packings
    order_o, slot_out_s = _layer_slots(
        gkey, jnp.where(valid, r % t, 0).astype(jnp.int32), valid
    )
    slot_out = jnp.zeros((e,), jnp.int32).at[order_o].set(slot_out_s)
    order_c, slot_src_s = _layer_slots(
        gkey, jnp.where(valid, c % t, 0).astype(jnp.int32), valid
    )
    slot_src = jnp.zeros((e,), jnp.int32).at[order_c].set(slot_src_s)

    # per-group layer counts -> packing choice (ties -> out-major)
    n_groups = r_tiles * N_EDGE_TYPE * r_tiles
    gk32 = jnp.where(valid, gkey, n_groups)
    lo = _segment_max(slot_out + 1, gk32, n_groups + 1)
    lc = _segment_max(slot_src + 1, gk32, n_groups + 1)
    use_src_major = (lc < lo)[jnp.clip(gk32, 0, n_groups)]
    slot_raw = jnp.where(use_src_major, slot_src, slot_out)
    slot = jnp.minimum(slot_raw, MAX_LAYERS - 1)
    layer_ovf = jnp.any(valid & (slot_raw >= MAX_LAYERS))

    # descriptor id per edge; compact unique ids (gkey*64 fits int32 up to
    # R ~ 1.7k; overflow guarded below)
    assert 7 * r_tiles * r_tiles * MAX_LAYERS < 2**31, (
        "descriptor key exceeds int32; shrink tile count"
    )
    big = jnp.iinfo(jnp.int32).max
    dkey = jnp.where(valid, gkey * MAX_LAYERS + slot, big)
    order = jnp.argsort(dkey, stable=True)
    dks = dkey[order]
    valids = valid[order]
    new = jnp.concatenate([valids[:1], (dks[1:] != dks[:-1]) & valids[1:]])
    new = new & valids
    rank = jnp.cumsum(new.astype(jnp.int32)) - 1
    n_real = jnp.sum(new.astype(jnp.int32))

    n_desc_slots = d_cap
    overflow = layer_ovf | (n_real > n_desc_slots)
    didx = jnp.where(valids, jnp.clip(rank, 0, n_desc_slots - 1), n_desc_slots)

    # descriptor attributes (scatter from first edge of each run)
    def scat(vals, fill, n):
        out = jnp.full((n + 1,), fill, vals.dtype)
        tgt = jnp.where(new & (rank < n), rank, n)
        return out.at[tgt].set(jnp.where(new, vals, fill), mode="drop")[:-1]

    its = it[order].astype(jnp.int32)
    jts = jt[order].astype(jnp.int32)
    dds = dd[order].astype(jnp.int32)
    sms = use_src_major[order].astype(jnp.int32)
    desc_tile = scat(its, r_tiles - 1, n_desc_slots)
    desc_src = scat(jts, 0, n_desc_slots)
    desc_dir = scat(dds, 0, n_desc_slots)
    desc_flag = scat(sms, 0, n_desc_slots)

    # offs/scale: offs[desc, out_l] = src_l (out-major) or
    # offs[desc, src_l] = out_l (src-major)
    rl = (r[order] % t).astype(jnp.int32)
    cl = (c[order] % t).astype(jnp.int32)
    sm_e = sms == 1
    pos = jnp.where(sm_e, cl, rl)
    val = jnp.where(sm_e, rl, cl)
    flat = jnp.where(
        valids & (rank < n_desc_slots) & (didx < n_desc_slots),
        didx * t + pos, n_desc_slots * t,
    )
    offs = jnp.full((n_desc_slots * t + 1,), -1, jnp.int32).at[flat].set(
        jnp.where(valids, val, -1), mode="drop"
    )[:-1].reshape(n_desc_slots, t)
    scale = jnp.zeros((n_desc_slots * t + 1,), jnp.float32).at[flat].set(
        jnp.where(valids, s[order], 0.0), mode="drop"
    )[:-1].reshape(n_desc_slots, t)
    return (desc_tile, desc_src, desc_dir, desc_flag, offs, scale, n_real,
            overflow)


def _build_side(r, c, d, s, valid, g, t, r_tiles, d_cap):
    """Build one side's placed descriptors: out rows = r, src rows = c.

    Returns (tile, src, dir, flag, first, last, offs, scale, active,
    overflow)."""
    (desc_tile, desc_src, desc_dir, desc_flag, offs, scale, n_real,
     overflow) = _make_descs(r, c, d, s, valid, g, t, r_tiles, d_cap)
    n_desc_slots = d_cap

    # Lay descriptors out in per-tile runs padded to multiples of
    # DESC_BLOCK (the kernel processes DESC_BLOCK descriptors per grid step
    # and Mosaic block shapes need an 8-divisible sublane dim), every tile
    # getting at least one run (so its output block is always written).
    db = DESC_BLOCK
    d_final = _final_cap(d_cap, r_tiles)
    real = jnp.arange(n_desc_slots) < n_real
    counts = jnp.zeros((r_tiles,), jnp.int32).at[
        jnp.where(real, desc_tile, r_tiles)
    ].add(1, mode="drop")
    padded = jnp.maximum(-(-counts // db), 1) * db
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)]
    )
    overflow = overflow | (starts[-1] > d_final)

    # rank within tile (descriptors are produced sorted by dkey, hence by
    # tile already)
    idx = jnp.arange(n_desc_slots, dtype=jnp.int32)
    tfirst = jnp.concatenate(
        [jnp.ones((1,), bool), desc_tile[1:] != desc_tile[:-1]]
    ) & real
    rstart = jax.lax.associative_scan(
        jnp.maximum, jnp.where(tfirst, idx, -1)
    )
    rank = idx - rstart
    new_pos = jnp.where(
        real, starts[jnp.clip(desc_tile, 0, r_tiles - 1)] + rank, d_final
    )
    new_pos = jnp.where(new_pos < d_final, new_pos, d_final)

    def place(vals, fill, width=None):
        if width is None:
            out = jnp.full((d_final + 1,), fill, vals.dtype)
            return out.at[new_pos].set(vals, mode="drop")[:-1]
        out = jnp.full(((d_final + 1) * width,), fill, vals.dtype)
        flat = jnp.where(
            new_pos[:, None] < d_final,
            new_pos[:, None] * width + jnp.arange(width)[None, :],
            d_final * width,
        )
        return out.at[flat.reshape(-1)].set(
            vals.reshape(-1), mode="drop"
        )[:-width].reshape(d_final, width)

    pos = jnp.arange(d_final, dtype=jnp.int32)
    tile_of_pos = jnp.clip(
        jnp.searchsorted(starts, pos, side="right") - 1, 0, r_tiles - 1
    ).astype(jnp.int32)
    src_all = place(desc_src, 0)
    dir_all = place(desc_dir, 0)
    flag_all = place(desc_flag, 0)
    active = place(jnp.ones((n_desc_slots,), jnp.int32), 0)
    offs_all = place(offs, -1, width=t)
    scale_all = place(scale, 0.0, width=t)
    first = (pos == starts[tile_of_pos]).astype(jnp.int32)
    nxt = jnp.minimum(starts[jnp.clip(tile_of_pos + 1, 0, r_tiles)], d_final)
    last = (pos == nxt - 1).astype(jnp.int32)
    return (tile_of_pos, src_all, dir_all, flag_all, first, last, offs_all,
            scale_all, active, overflow)


@partial(jax.jit, static_argnames=("tile_t", "desc_factor"))
def build_conv_plan(
    lvl: GraphLevel, tile_t: int = TILE, desc_factor: int = 56
) -> ConvPlan:
    """Build the forward + transpose descriptor plans for a level."""
    g = lvl.g_cap
    t = tile_t
    r_tiles = -(-g // t)
    d_cap = r_tiles * desc_factor

    row = lvl.edge_row
    col = lvl.edge_col
    dirs = lvl.edge_dir
    valid = lvl.edge_row < g

    f = _build_side(row, col, dirs, lvl.edge_scale, valid, g, t, r_tiles,
                    d_cap)
    b = _build_side(col, row, dirs, lvl.edge_scale, valid, g, t, r_tiles,
                    d_cap)
    return ConvPlan(
        tile_t=t, n_tiles=r_tiles, g_pad=r_tiles * t,
        d_cap=_final_cap(d_cap, r_tiles),
        f_tile=f[0], f_src=f[1], f_dir=f[2], f_flag=f[3], f_first=f[4],
        f_last=f[5], f_offs=f[6], f_scale=f[7], f_active=f[8],
        b_tile=b[0], b_src=b[1], b_dir=b[2], b_flag=b[3], b_first=b[4],
        b_last=b[5], b_offs=b[6], b_scale=b[7], b_active=b[8],
        overflow=f[9] | b[9] | lvl.overflow,
    )


def plan_apply_reference(x: jnp.ndarray, plan: ConvPlan) -> jnp.ndarray:
    """Pure-JAX application of the forward plan -> the [G_pad, 7C] column
    buffer.  Slow (materialises every one-hot) — used only to validate plans
    against ``graph_ops.graph_conv``'s segment-sum column buffer in tests."""
    t = plan.tile_t
    c = x.shape[1]
    xp = jnp.pad(x, ((0, plan.g_pad - x.shape[0]), (0, 0)))
    col = jnp.zeros((plan.g_pad, N_EDGE_TYPE * c), x.dtype)
    iota = jnp.arange(t, dtype=jnp.int32)

    def body(i, col):
        src = jax.lax.dynamic_slice(
            xp, (plan.f_src[i] * t, 0), (t, c)
        )
        offs = plan.f_offs[i]
        sc = plan.f_scale[i]
        m_out = (offs[:, None] == iota[None, :]) * sc[:, None]
        m_src = (iota[:, None] == offs[None, :]) * sc[None, :]
        m = jnp.where(plan.f_flag[i] == 1, m_src, m_out).astype(x.dtype)
        part = m @ src                                  # [T, C]
        full = jnp.zeros((t, N_EDGE_TYPE * c), x.dtype)
        full = jax.lax.dynamic_update_slice(
            full, part, (0, plan.f_dir[i] * c)
        )
        return jax.lax.dynamic_update_slice(
            col,
            jax.lax.dynamic_slice(
                col, (plan.f_tile[i] * t, 0), (t, N_EDGE_TYPE * c)
            ) + full,
            (plan.f_tile[i] * t, 0),
        )

    return jax.lax.fori_loop(0, plan.d_cap, body, col)


# ----------------------------------------------------------------------
# k-packed layout (experimental): consecutive descriptors sharing
# (out-tile, dir) merge into packs of K_PACK slots -> the kernel issues ONE
# [T, K*T] @ [K*T, C] matmul + ONE column-buffer accumulate per pack
# instead of K of each (per-issue overhead dominates the measured
# per-descriptor cost).  Forward-only; sampling never differentiates.
# ----------------------------------------------------------------------
K_PACK = 4
PACK_BLOCK = 8


class PackedConvPlan(struct.PyTreeNode):
    """K-packed forward plan for one GraphLevel."""

    tile_t: int = struct.field(pytree_node=False)
    k: int = struct.field(pytree_node=False)
    n_tiles: int = struct.field(pytree_node=False)
    g_pad: int = struct.field(pytree_node=False)
    p_cap: int = struct.field(pytree_node=False)
    f_tile: jnp.ndarray    # int32 [P]
    f_dir: jnp.ndarray     # int32 [P]
    f_first: jnp.ndarray   # int32 [P]
    f_last: jnp.ndarray    # int32 [P]
    f_active: jnp.ndarray  # int32 [P] (any slot active)
    f_src: jnp.ndarray     # int32 [P*K] flat src tile per slot
    f_flag: jnp.ndarray    # int32 [P*K]
    f_offs: jnp.ndarray    # int32 [P, K*T]
    f_scale: jnp.ndarray   # f32 [P, K*T]
    overflow: jnp.ndarray


def _scan_max(x):
    return jax.lax.associative_scan(jnp.maximum, x)


def _build_side_packed(r, c, d, s, valid, g, t, r_tiles, d_cap, k,
                       pack_factor):
    (desc_tile, desc_src, desc_dir, desc_flag, offs, scale, n_real,
     overflow) = _make_descs(r, c, d, s, valid, g, t, r_tiles, d_cap)
    n = d_cap
    idx = jnp.arange(n, dtype=jnp.int32)
    real = idx < n_real

    # pack slots: position within the (tile, dir) run, modulo k
    gkey = desc_tile * N_EDGE_TYPE + desc_dir
    gfirst = jnp.concatenate(
        [jnp.ones((1,), bool), gkey[1:] != gkey[:-1]]
    ) & real
    gstart = _scan_max(jnp.where(gfirst, idx, -1))
    prank = idx - gstart
    slot = prank % k
    pack_first = (slot == 0) & real

    tfirst = jnp.concatenate(
        [jnp.ones((1,), bool), desc_tile[1:] != desc_tile[:-1]]
    ) & real

    pb = PACK_BLOCK
    pcounts = jnp.zeros((r_tiles,), jnp.int32).at[
        jnp.where(pack_first, desc_tile, r_tiles)
    ].add(1, mode="drop")
    padded = jnp.maximum(-(-pcounts // pb), 1) * pb
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)]
    )
    p_final = -(-(r_tiles * pack_factor) // pb) * pb
    overflow = overflow | (starts[-1] > p_final)

    # index of this descriptor's pack within its tile: inclusive count of
    # pack starts up to here, relative to the tile-run start (which always
    # starts a pack itself, so the difference is exactly the pack index)
    inc = jnp.cumsum(pack_first.astype(jnp.int32))
    rstart = _scan_max(jnp.where(tfirst, idx, -1))
    pack_in_tile = inc - inc[jnp.clip(rstart, 0, n - 1)]
    pack_pos = jnp.where(
        real, starts[jnp.clip(desc_tile, 0, r_tiles - 1)] + pack_in_tile,
        p_final,
    )
    pack_pos = jnp.minimum(pack_pos, p_final)

    slot_flat = jnp.where(
        pack_pos < p_final, pack_pos * k + slot, p_final * k
    )

    def place_slot(vals, fill, width=None):
        if width is None:
            out = jnp.full((p_final * k + 1,), fill, vals.dtype)
            return out.at[slot_flat].set(
                jnp.where(real, vals, fill), mode="drop"
            )[:-1]
        out = jnp.full(((p_final * k + 1) * width,), fill, vals.dtype)
        flat = jnp.where(
            (slot_flat[:, None] < p_final * k) & real[:, None],
            slot_flat[:, None] * width + jnp.arange(width)[None, :],
            p_final * k * width,
        )
        return out.at[flat.reshape(-1)].set(
            vals.reshape(-1), mode="drop"
        )[:-width].reshape(p_final * k, width)

    ps_src = place_slot(desc_src, 0).reshape(p_final * k)
    ps_flag = place_slot(desc_flag, 0).reshape(p_final * k)
    offs_all = place_slot(offs, -1, width=t).reshape(p_final, k * t)
    scale_all = place_slot(scale, 0.0, width=t).reshape(p_final, k * t)

    # per-pack attrs (from slot-0 descriptors)
    ppos0 = jnp.where(pack_first, pack_pos, p_final)

    def place_pack(vals, fill):
        out = jnp.full((p_final + 1,), fill, vals.dtype)
        return out.at[ppos0].set(vals, mode="drop")[:-1]

    p_dir = place_pack(desc_dir, 0)
    p_active = place_pack(jnp.ones((n,), jnp.int32), 0)

    pos = jnp.arange(p_final, dtype=jnp.int32)
    tile_of_pos = jnp.clip(
        jnp.searchsorted(starts, pos, side="right") - 1, 0, r_tiles - 1
    ).astype(jnp.int32)
    first = (pos == starts[tile_of_pos]).astype(jnp.int32)
    nxt = jnp.minimum(starts[jnp.clip(tile_of_pos + 1, 0, r_tiles)], p_final)
    last = (pos == nxt - 1).astype(jnp.int32)
    return (tile_of_pos, p_dir, first, last, p_active, ps_src, ps_flag,
            offs_all, scale_all, overflow)


@partial(jax.jit, static_argnames=("tile_t", "desc_factor", "k",
                                   "pack_factor"))
def build_packed_conv_plan(
    lvl: GraphLevel, tile_t: int = TILE, desc_factor: int = 56,
    k: int = K_PACK, pack_factor: int = 24,
) -> PackedConvPlan:
    """Forward-only k-packed descriptor plan for one level."""
    g = lvl.g_cap
    t = tile_t
    r_tiles = -(-g // t)
    d_cap = r_tiles * desc_factor
    valid = lvl.edge_row < g
    f = _build_side_packed(
        lvl.edge_row, lvl.edge_col, lvl.edge_dir, lvl.edge_scale, valid,
        g, t, r_tiles, d_cap, k, pack_factor,
    )
    return PackedConvPlan(
        tile_t=t, k=k, n_tiles=r_tiles, g_pad=r_tiles * t,
        p_cap=-(-(r_tiles * pack_factor) // PACK_BLOCK) * PACK_BLOCK,
        f_tile=f[0], f_dir=f[1], f_first=f[2], f_last=f[3], f_active=f[4],
        f_src=f[5], f_flag=f[6], f_offs=f[7], f_scale=f[8],
        overflow=f[9] | lvl.overflow,
    )
