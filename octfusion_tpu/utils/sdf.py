"""Dense SDF grid evaluation of the MPU + mesh export
(`/root/reference/utils/util_dualoctree.py:99-118` calc_sdf; export at
`models/octfusion_model_union.py:425-468`).

The whole grid is evaluated in ONE jitted program: query coordinates are
generated on device (iota), chunks stream through ``lax.map`` (bounding peak
memory exactly like the reference's 64^3 chunking), and a single fp16
device->host transfer returns the grid — critical when the accelerator sits
behind a slow link."""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..octree.octree import Octree
from ..ops import mpu as mpu_ops


def grid_points(size: int, bbmin: float, bbmax: float) -> np.ndarray:
    coord = np.arange(size, dtype=np.float32)
    g = np.stack(np.meshgrid(coord, coord, coord, indexing="ij"), -1)
    g = g.reshape(-1, 3) * ((bbmax - bbmin) / size) + bbmin
    return g


@partial(
    jax.jit,
    static_argnames=("full_depth", "depth_end", "size", "max_batch", "bsz"),
)
def _sdf_grid(reg_levels, octree, full_depth, depth_end, size, bbmin, bbmax,
              max_batch, bsz):
    num = size**3
    n_chunks = -(-num // max_batch)
    # dense key->slot tables turn every corner lookup into one gather
    tables = {
        dd: octree.lookup_table(dd)
        for dd in range(full_depth, depth_end + 1)
    }

    def chunk(args):
        b, c = args
        idx = c * max_batch + jnp.arange(max_batch, dtype=jnp.int32)
        idx = jnp.minimum(idx, num - 1)
        x = idx // (size * size)
        y = (idx // size) % size
        z = idx % size
        pos = jnp.stack([x, y, z], -1).astype(jnp.float32)
        pos = pos * ((bbmax - bbmin) / size) + bbmin
        pb = jnp.full((max_batch,), b, jnp.int32)
        sdf, _ = mpu_ops.mpu_eval(
            pos, pb, reg_levels, octree, full_depth, depth_end,
            tables=tables,
        )
        return sdf.astype(jnp.float16)

    bs = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n_chunks)
    cs = jnp.tile(jnp.arange(n_chunks, dtype=jnp.int32), bsz)
    out = jax.lax.map(chunk, (bs, cs))           # [bsz*n_chunks, max_batch]
    out = out.reshape(bsz, n_chunks * max_batch)[:, :num]
    return out


@partial(
    jax.jit,
    static_argnames=("full_depth", "depth_end", "size", "max_batch", "bsz",
                     "near_frac"),
)
def _sdf_grid_hier(reg_levels, octree, full_depth, depth_end, size, bbmin,
                   bbmax, max_batch, bsz, near_frac=0.125):
    """Coarse-to-fine grid: evaluate at size/2, trilinearly upsample, then
    re-evaluate exactly only the ``near_frac`` voxels closest to the surface
    (iso-surfacing only needs exact values there).  ~4x fewer MPU queries
    than the dense pass."""
    half = size // 2
    coarse = _sdf_grid(
        reg_levels, octree, full_depth, depth_end, half, bbmin, bbmax,
        max_batch, bsz,
    ).astype(jnp.float32).reshape(bsz, half, half, half)
    fine = jax.image.resize(
        coarse, (bsz, size, size, size), method="trilinear"
    ).reshape(bsz, size**3)

    # select near-surface COARSE cells (8x smaller sort), refine their 8
    # children each; at least one chunk, at most every coarse cell
    near_cap = max(int(size**3 * near_frac) // max_batch, 1) * max_batch
    near_cap = min(near_cap, half**3 * 8)
    n_coarse = near_cap // 8
    corder = jnp.argsort(
        jnp.abs(coarse.reshape(bsz, half**3)), axis=1
    )[:, :n_coarse]                                      # [bsz, cap/8]
    cx = corder // (half * half)
    cy = (corder // half) % half
    cz = corder % half
    oct_off = jnp.arange(8, dtype=jnp.int32)
    ox, oy, oz = (oct_off >> 2) & 1, (oct_off >> 1) & 1, oct_off & 1
    fx = (2 * cx[..., None] + ox).reshape(bsz, -1)
    fy = (2 * cy[..., None] + oy).reshape(bsz, -1)
    fz = (2 * cz[..., None] + oz).reshape(bsz, -1)
    order = (fx * size + fy) * size + fz                 # [bsz, near_cap]

    tables = {
        dd: octree.lookup_table(dd)
        for dd in range(full_depth, depth_end + 1)
    }

    def refine(args):
        b, c = args
        idx = jax.lax.dynamic_slice(
            order[b], (c * max_batch,), (max_batch,)
        )
        x = idx // (size * size)
        y = (idx // size) % size
        z = idx % size
        pos = jnp.stack([x, y, z], -1).astype(jnp.float32)
        pos = pos * ((bbmax - bbmin) / size) + bbmin
        pb = jnp.full((max_batch,), b, jnp.int32)
        sdf, _ = mpu_ops.mpu_eval(
            pos, pb, reg_levels, octree, full_depth, depth_end,
            tables=tables,
        )
        return idx, sdf

    n_chunks = near_cap // max_batch
    bs = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n_chunks)
    cs = jnp.tile(jnp.arange(n_chunks, dtype=jnp.int32), bsz)
    idxs, vals = jax.lax.map(refine, (bs, cs))
    idxs = idxs.reshape(bsz, near_cap)
    vals = vals.reshape(bsz, near_cap)
    fine = jax.vmap(lambda f, i, v: f.at[i].set(v))(fine, idxs, vals)
    return fine.astype(jnp.float16)


@partial(
    jax.jit,
    static_argnames=("full_depth", "depth_end", "size"),
)
def _sdf_grid_dense(reg_levels, octree, full_depth, depth_end, size, bbmin,
                    bbmax):
    """Grid SDF via dense separable trilinear resampling
    (`ops/mpu.mpu_grid_eval`) — no per-query corner gathers at all; ~100x
    faster than the chunked gather path on TPU.  fp16 result for transfer."""
    return mpu_ops.mpu_grid_eval(
        reg_levels, octree, full_depth, depth_end, size, bbmin, bbmax
    ).astype(jnp.float16)


def _near_cap(size: int, near_frac: float, max_batch: int) -> int:
    half = size // 2
    cap = max(int(size**3 * near_frac) // max_batch, 1) * max_batch
    return min(cap, half**3 * 8)


@partial(
    jax.jit,
    static_argnames=("full_depth", "depth_end", "size", "max_batch", "bsz",
                     "near_frac"),
)
def _sdf_grid_hier_packed(reg_levels, octree, full_depth, depth_end, size,
                          bbmin, bbmax, max_batch, bsz, near_frac=0.125):
    """Like _sdf_grid_hier but returns (coarse [B, half^3] fp16,
    refined vals [B, near_cap] fp16) — the host reproduces the deterministic
    coarse-cell selection and reassembles the fine grid, cutting the
    device->host transfer ~4x (it rides a slow tunnel here)."""
    half = size // 2
    coarse = _sdf_grid(
        reg_levels, octree, full_depth, depth_end, half, bbmin, bbmax,
        max_batch, bsz,
    )
    near_cap = _near_cap(size, near_frac, max_batch)
    n_coarse = near_cap // 8
    corder = jnp.argsort(
        jnp.abs(coarse.astype(jnp.float32)), axis=1, stable=True
    )[:, :n_coarse]
    order = _expand_children(corder, half, size)
    tables = {
        dd: octree.lookup_table(dd)
        for dd in range(full_depth, depth_end + 1)
    }

    def refine(args):
        b, c = args
        idx = jax.lax.dynamic_slice(order[b], (c * max_batch,), (max_batch,))
        x = idx // (size * size)
        y = (idx // size) % size
        z = idx % size
        pos = jnp.stack([x, y, z], -1).astype(jnp.float32)
        pos = pos * ((bbmax - bbmin) / size) + bbmin
        pb = jnp.full((max_batch,), b, jnp.int32)
        sdf, _ = mpu_ops.mpu_eval(
            pos, pb, reg_levels, octree, full_depth, depth_end,
            tables=tables,
        )
        return sdf.astype(jnp.float16)

    n_chunks = near_cap // max_batch
    bs = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n_chunks)
    cs = jnp.tile(jnp.arange(n_chunks, dtype=jnp.int32), bsz)
    vals = jax.lax.map(refine, (bs, cs)).reshape(bsz, near_cap)
    return coarse, vals


def _expand_children(corder, half, size):
    """coarse flat ids [B, n] -> their 8 children's fine flat ids [B, 8n]."""
    cx = corder // (half * half)
    cy = (corder // half) % half
    cz = corder % half
    oct_off = jnp.arange(8, dtype=corder.dtype)
    ox, oy, oz = (oct_off >> 2) & 1, (oct_off >> 1) & 1, oct_off & 1
    fx = (2 * cx[..., None] + ox).reshape(corder.shape[0], -1)
    fy = (2 * cy[..., None] + oy).reshape(corder.shape[0], -1)
    fz = (2 * cz[..., None] + oz).reshape(corder.shape[0], -1)
    return (fx * size + fy) * size + fz


def _host_upsample2(coarse: np.ndarray, size: int) -> np.ndarray:
    """Host trilinear 2x upsample matching jax.image.resize('trilinear')
    closely enough for far-from-surface cells (near-surface cells are
    overwritten with exact values)."""
    from scipy.ndimage import zoom

    return zoom(coarse, 2.0, order=1, grid_mode=True, mode="nearest")


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
    mode: str = "dense",
    hierarchical: bool = True,
    near_frac: float = 0.125,
) -> np.ndarray:
    """[B, size, size, size] SDF values (float32 on host, fp16 transfer).

    ``mode='dense'`` (default) uses the resampling evaluator; ``'gather'``
    keeps the per-query corner-search path (the reference formulation,
    `util_dualoctree.py:99-118`) with optional hierarchical refinement."""
    if mode == "dense":
        out = _sdf_grid_dense(
            reg_levels, octree, full_depth, depth_end, size,
            jnp.float32(bbmin), jnp.float32(bbmax),
        )
        return np.asarray(out).astype(np.float32)
    if hierarchical and size >= 2 * round(max_batch ** (1 / 3)):
        half = size // 2
        coarse, vals = _sdf_grid_hier_packed(
            reg_levels, octree, full_depth, depth_end, size,
            jnp.float32(bbmin), jnp.float32(bbmax), max_batch, batch_size,
            near_frac=near_frac,
        )
        coarse = np.asarray(coarse).astype(np.float32)
        vals = np.asarray(vals).astype(np.float32)
        near_cap = _near_cap(size, near_frac, max_batch)
        n_coarse = near_cap // 8
        out = np.empty((batch_size, size, size, size), np.float32)
        for b in range(batch_size):
            cb = coarse[b]
            # reproduce the device's stable selection exactly (same fp16
            # values, stable argsort on both sides)
            corder = np.argsort(np.abs(cb), kind="stable")[:n_coarse]
            order = np.asarray(
                _expand_children(jnp.asarray(corder[None]), half, size)
            )[0]
            fine = _host_upsample2(cb.reshape(half, half, half), size)
            fine = fine.reshape(-1)
            fine[order] = vals[b]
            out[b] = fine.reshape(size, size, size)
        return out
    out = _sdf_grid(
        reg_levels, octree, full_depth, depth_end, size,
        jnp.float32(bbmin), jnp.float32(bbmax), max_batch, batch_size,
    )
    return np.asarray(out).astype(np.float32).reshape(
        batch_size, size, size, size
    )


# ----------------------------------------------------------------------
# device-side active-cell extraction (compact iso-surfacing transfer)
# ----------------------------------------------------------------------
@partial(jax.jit, static_argnames=("cap", "level"))
def _active_cells(grid: jnp.ndarray, cap: int, level: float = 0.0):
    """Find iso-crossing cells of [B, R, R, R] grids on device.

    A cell (i,j,k), i..k in [0, R-2], is active iff its 8 corners straddle
    ``level`` — exactly the cells where marching produces triangles.
    Returns (ids [B, cap] int32 flat cell ids (R-1)^3, vals [B, cap, 8]
    f16 corner values, counts [B] int32, inside [B, R^3] bool sign bits).
    ``counts > cap`` means truncation — fall back to the dense transfer."""
    b, r = grid.shape[0], grid.shape[1]
    gf = grid.astype(jnp.float32)
    corners = [
        gf[:, dx: r - 1 + dx, dy: r - 1 + dy, dz: r - 1 + dz]
        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
    ]
    stack = jnp.stack(corners, -1)                   # [B, R-1, R-1, R-1, 8]
    mn = jnp.min(stack, -1)
    mx = jnp.max(stack, -1)
    # exactly the marcher's emission condition (some corner < level, some
    # >= level).  A plain mn<=level<=mx would also count level-flat cells —
    # e.g. the all-zero regions an octree without coverage evaluates to —
    # which emit nothing but can push a real surface past ``cap``
    active = (mn < level) & (mx >= level)
    m = r - 1
    act = active.reshape(b, m * m * m)
    counts = jnp.sum(act.astype(jnp.int32), axis=1)

    def pick(a, vals):
        # cumsum compaction (no 16.7M-element sort): rank of each active
        # cell -> scatter its id, then gather the 8 corner values
        rank = jnp.cumsum(a.astype(jnp.int32)) - 1
        tgt = jnp.where(a & (rank < cap), rank, cap)
        ids = jnp.full((cap + 1,), -1, jnp.int32).at[tgt].set(
            jnp.arange(a.shape[0], dtype=jnp.int32), mode="drop"
        )[:cap]
        ok = ids >= 0
        v = jnp.where(
            ok[:, None], vals[jnp.clip(ids, 0, a.shape[0] - 1)], 0
        ).astype(jnp.float16)
        return ids, v

    ids, vals = jax.vmap(pick)(act, stack.reshape(b, m * m * m, 8))
    inside = (gf < level).reshape(b, r * r * r)
    return ids, vals, counts, inside


@partial(
    jax.jit,
    static_argnames=("full_depth", "depth_end", "size", "cap", "level"),
)
def _sdf_compact_device(reg_levels, octree, full_depth, depth_end, size,
                        bbmin, bbmax, cap, level):
    """Grid eval + active-cell extraction as ONE device program (eager ops
    are network round-trips on the tunnelled backend)."""
    grid = mpu_ops.mpu_grid_eval(
        reg_levels, octree, full_depth, depth_end, size, bbmin, bbmax
    )
    ids, vals, counts, inside = _active_cells(grid, cap, level)
    return ids, vals, counts, inside, grid.astype(jnp.float16)


@lru_cache(maxsize=None)
def _bucket_slicer(b: int):
    """Jitted [:, :b] slice (cached per bucket so repeat calls don't
    retrace).  Used to ship only ~count active cells instead of the full
    static cap — the tunnel D2H is the variable-latency part of the
    compact path."""
    return jax.jit(lambda a: a[:, :b])


def _fetch_compact(ids, vals, counts_h, cap: int):
    """D2H of (ids, vals) sliced to a power-of-2 bucket >= max count."""
    nmax = int(counts_h.max())
    b = 1 << max(14, (max(nmax, 1) - 1).bit_length())
    if b >= cap:
        return np.asarray(ids), np.asarray(vals)
    sl = _bucket_slicer(b)
    return np.asarray(sl(ids)), np.asarray(sl(vals))


def calc_sdf_compact(
    reg_levels: Dict[int, jnp.ndarray],
    octree: Octree,
    full_depth: int,
    depth_end: int,
    batch_size: int = 1,
    size: int = 256,
    bbmin: float = -0.9,
    bbmax: float = 0.9,
    cell_cap: Optional[int] = None,
    level: float = 0.0,
) -> np.ndarray:
    """Dense-evaluate the SDF grid on device, extract active cells, ship
    only (sign bits + active corner values) and reassemble a
    marching-equivalent grid on the host.

    The reconstructed grid has exact values at every corner of every
    iso-crossing cell and sign-correct fillers (level±1) elsewhere, so
    marching produces *identical* triangles to the full grid.  Transfer is
    ~R³/8 bits + 16·A bytes instead of 2·R³ — matters when the device sits
    behind a slow link (and on real hardware it keeps iso-surfacing off the
    host's critical path).  Falls back to the dense transfer when the
    surface exceeds ``cell_cap`` (e.g. noise fields from untrained
    weights)."""
    if cell_cap is None:
        cell_cap = 8 * size * size
    ids, vals, counts, inside, grid = _sdf_compact_device(
        reg_levels, octree, full_depth, depth_end, size,
        jnp.float32(bbmin), jnp.float32(bbmax), cell_cap, level,
    )
    counts_h = np.asarray(counts)
    if (counts_h > cell_cap).any():
        # surface exceeds the cap (e.g. noise fields): dense fp16 fallback
        return np.asarray(grid).astype(np.float32)
    ids_h, vals_h = _fetch_compact(ids, vals, counts_h, cell_cap)
    vals_h = vals_h.astype(np.float32)
    inside_h = np.asarray(inside)

    m = size - 1
    out = np.empty((batch_size, size, size, size), np.float32)
    for b in range(batch_size):
        fill = np.where(inside_h[b], level - 1.0, level + 1.0).astype(
            np.float32
        ).reshape(size, size, size)
        ok = ids_h[b] >= 0
        ci = ids_h[b][ok]
        x = ci // (m * m)
        y = (ci // m) % m
        z = ci % m
        v = vals_h[b][ok]
        k = 0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    fill[x + dx, y + dy, z + dz] = v[:, k]
                    k += 1
        out[b] = fill
    return out


def extract_meshes_submit(
    reg_levels: Dict[int, jnp.ndarray],
    octree: Octree,
    full_depth: int,
    depth_end: int,
    batch_size: int = 1,
    size: int = 256,
    bbmin: float = -0.9,
    bbmax: float = 0.9,
    cell_cap: Optional[int] = None,
    level: float = 0.0,
):
    """Dispatch the device half of compact mesh extraction WITHOUT any host
    sync — returns a handle for :func:`extract_meshes_finish`.  Splitting
    the two lets callers overlap shape i's host marching/D2H with shape
    i+1's device work (generation pipelining)."""
    if cell_cap is None:
        cell_cap = 8 * size * size
    ids, vals, counts, inside, grid = _sdf_compact_device(
        reg_levels, octree, full_depth, depth_end, size,
        jnp.float32(bbmin), jnp.float32(bbmax), cell_cap, level,
    )
    return (ids, vals, counts, grid, batch_size, size, cell_cap, level)


def extract_meshes_finish(handle):
    """Host half: fetch compact cells (bucketed) and march.  Falls back to
    the dense-grid transfer + full marching when a sample's surface exceeds
    the cell cap."""
    from . import mesh as mesh_utils

    ids, vals, counts, grid, batch_size, size, cell_cap, level = handle
    counts_h = np.asarray(counts)
    if (counts_h > cell_cap).any():
        g = np.asarray(grid).astype(np.float32)
        return [
            mesh_utils.marching_tetrahedra(g[b], level)
            for b in range(batch_size)
        ]
    ids_h, vals_h = _fetch_compact(ids, vals, counts_h, cell_cap)
    vals_h = vals_h.astype(np.float32)
    return [
        mesh_utils.marching_from_cells(ids_h[b], vals_h[b], size, level)
        for b in range(batch_size)
    ]


def extract_meshes_compact(
    reg_levels: Dict[int, jnp.ndarray],
    octree: Octree,
    full_depth: int,
    depth_end: int,
    batch_size: int = 1,
    size: int = 256,
    bbmin: float = -0.9,
    bbmax: float = 0.9,
    cell_cap: Optional[int] = None,
    level: float = 0.0,
):
    """Device SDF eval + active-cell extraction + host marching WITHOUT ever
    materialising the dense grid on the host: marching runs directly on the
    compact cells (``mesh.marching_from_cells``).  Returns a list of
    (verts, faces) per sample, verts in voxel coordinates of the implied
    [size]³ grid."""
    return extract_meshes_finish(extract_meshes_submit(
        reg_levels, octree, full_depth, depth_end, batch_size, size,
        bbmin, bbmax, cell_cap, level,
    ))


def export_meshes_compact(
    reg_levels,
    octree: Octree,
    full_depth: int,
    depth_end: int,
    save_paths,
    size: int = 256,
    bbmin: float = -0.9,
    bbmax: float = 0.9,
    level: float = 0.0,
    mesh_scale: float = 1.0,
):
    """End-to-end mesh export via the compact-cell path (generation CLI's
    fast path; `octfusion_model_union.py:435-468`)."""
    from . import mesh as mesh_utils

    meshes = extract_meshes_compact(
        reg_levels, octree, full_depth, depth_end, len(save_paths),
        size=size, bbmin=bbmin, bbmax=bbmax, level=level,
    )
    written = []
    for (verts, faces), path in zip(meshes, save_paths):
        if len(verts) == 0:
            written.append(None)
            continue
        verts = verts * ((bbmax - bbmin) / size) + bbmin
        verts = verts * mesh_scale
        mesh_utils.save_obj(path, verts, faces)
        written.append(path)
    return written


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
    from . import mesh as mesh_utils

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
