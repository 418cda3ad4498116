"""Host-side mesh utilities: iso-surface extraction, OBJ/PLY IO, surface
sampling.

The reference leans on skimage.measure.marching_cubes + trimesh
(`/root/reference/models/octfusion_model_union.py:435-468`); neither is in
this image, so we ship a vectorised numpy *marching tetrahedra* (each cube
split into 6 tets — table-free, watertight on shared faces) plus minimal
OBJ/PLY writers and area-weighted surface sampling for the metrics stack.
"""

from __future__ import annotations

import numpy as np

# 6-tetrahedra decomposition of the unit cube (corner indices 0..7 with
# corner c having coords ((c>>2)&1, (c>>1)&1, c&1) — x-major like our voxel
# indexing).  All tets share the main diagonal 0-7 so faces match between
# neighbouring cubes.
_TETS = np.array(
    [
        [0, 4, 6, 7],
        [0, 6, 2, 7],
        [0, 2, 3, 7],
        [0, 3, 1, 7],
        [0, 1, 5, 7],
        [0, 5, 4, 7],
    ],
    np.int64,
)
_CORNER_OFF = np.array(
    [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], np.int64
)



# Tet edge list: the 6 (corner, corner) pairs of a tetrahedron.
_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
_EDGE_ID = {e: i for i, e in enumerate(_TET_EDGES)}


def _build_case_table():
    """For each of the 16 sign codes: up to 2 triangles, each 3 edge ids
    into ``_TET_EDGES``; -1 = no triangle.  The linear edge interpolation
    is symmetric in its endpoints, so edge storage order is irrelevant."""
    tri_tab = np.full((16, 2, 3), -1, np.int64)

    def eid(i, j):
        if (i, j) in _EDGE_ID:
            return _EDGE_ID[(i, j)]
        return _EDGE_ID[(j, i)]

    for case in range(1, 15):
        ins = [i for i in range(4) if (case >> i) & 1]
        outs = [i for i in range(4) if not (case >> i) & 1]
        if len(ins) == 1:
            i = ins[0]
            tri_tab[case, 0] = [eid(i, outs[0]), eid(i, outs[1]),
                                eid(i, outs[2])]
        elif len(ins) == 3:
            o = outs[0]
            tri_tab[case, 0] = [eid(ins[0], o), eid(ins[1], o),
                                eid(ins[2], o)]
        else:
            i0, i1 = ins
            o0, o1 = outs
            p00, p01 = eid(i0, o0), eid(i0, o1)
            p10, p11 = eid(i1, o0), eid(i1, o1)
            tri_tab[case, 0] = [p00, p01, p11]
            tri_tab[case, 1] = [p00, p11, p10]
    return tri_tab


_TRI_TABLE = _build_case_table()


def _build_flip_table():
    """[6, 16, 2] bool: whether triangle s of (tet, case) must be flipped so
    its normal points toward positive values.  Within a tet the emitted
    surface comes from the tet-LINEAR interpolant, whose gradient is
    constant — so winding vs gradient is a constant of (tet, case), not of
    the data.  Evaluated once on a canonical sign assignment."""
    flip = np.zeros((len(_TETS), 16, 2), bool)
    for ti, tet in enumerate(_TETS):
        p = _CORNER_OFF[tet].astype(np.float64)   # [4, 3]
        # gradient basis of the linear interpolant on this tet:
        # f(x) = v0 + (v - v0) · B (x - p0) with B = inv(edge matrix)
        e = (p[1:] - p[0]).T                      # [3, 3]
        binv = np.linalg.inv(e)
        for case in range(1, 15):
            v = np.where([(case >> i) & 1 for i in range(4)], -1.0, 1.0)
            grad = binv.T @ (v[1:] - v[0])
            for s in range(2):
                e3 = _TRI_TABLE[case, s]
                if e3[0] < 0:
                    continue
                pts = []
                for eix in e3:
                    i, j = _TET_EDGES[eix]
                    a, b = v[i], v[j]
                    t = a / (a - b)
                    pts.append(p[i] + t * (p[j] - p[i]))
                nrm = np.cross(pts[1] - pts[0], pts[2] - pts[0])
                flip[ti, case, s] = float(nrm @ grad) < 0
    return flip


_FLIP_TABLE = _build_flip_table()


def _march_cells(cube_origin: np.ndarray, vals: np.ndarray):
    """Marching tetrahedra over explicit active cells.

    ``cube_origin [M, 3]`` integer voxel origins, ``vals [M, 8]``
    level-subtracted corner values (x-major corner order).  Returns welded
    (verts, faces) with triangles oriented toward positive SDF (winding is
    a constant of (tet, sign-case) — ``_FLIP_TABLE`` — so no per-triangle
    normal/gradient work).  Interpolation happens only for the gathered
    triangle vertices, in float32."""
    verts_list = []
    faces_list = []
    vcount = 0
    vals = np.ascontiguousarray(vals, np.float32)
    ii_e = np.array([e[0] for e in _TET_EDGES])
    jj_e = np.array([e[1] for e in _TET_EDGES])
    for ti, tet in enumerate(_TETS):
        tv = vals[:, tet]                        # [M,4]
        inside = tv < 0
        code = (
            inside[:, 0].astype(np.int64)
            + 2 * inside[:, 1]
            + 4 * inside[:, 2]
            + 8 * inside[:, 3]
        )
        active = (code > 0) & (code < 15)
        if not active.any():
            continue
        tv_a = tv[active]
        code_a = code[active]
        origin_a = cube_origin[active].astype(np.float32)
        cpos = _CORNER_OFF[tet].astype(np.float32)        # [4, 3]

        edges2 = _TRI_TABLE[code_a]              # [Ma, 2, 3]
        for s in range(2):
            e3 = edges2[:, s]                    # [Ma, 3]
            have = e3[:, 0] >= 0
            if not have.any():
                continue
            e3h = e3[have]                       # [k, 3] edge ids
            tv_h = tv_a[have]                    # [k, 4]
            i_ix = ii_e[e3h]                     # [k, 3] tet corner ids
            j_ix = jj_e[e3h]
            a = np.take_along_axis(tv_h, i_ix, 1)
            b = np.take_along_axis(tv_h, j_ix, 1)
            t = a / np.where(np.abs(a - b) < 1e-12, 1e-12, a - b)
            t = np.clip(t, 0.0, 1.0)[..., None]
            pi = cpos[i_ix]                      # [k, 3, 3]
            pj = cpos[j_ix]
            tri = origin_a[have][:, None, :] + pi + t * (pj - pi)
            fl = _FLIP_TABLE[ti, :, s][code_a[have]]
            if fl.any():
                tri[fl] = tri[fl][:, ::-1]
            k = tri.shape[0]
            verts_list.append(tri.reshape(-1, 3))
            faces_list.append(
                np.arange(3 * k, dtype=np.int64).reshape(k, 3) + vcount
            )
            vcount += 3 * k

    if not verts_list:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    verts = np.concatenate(verts_list, 0)
    faces = np.concatenate(faces_list, 0)

    # weld duplicate vertices (quantised) to get a manifold-ish mesh;
    # pack the quantised coords into one int64 (21 bits/axis) — unique on a
    # scalar key is ~3x faster than on a structured record
    key3 = np.round(verts * 1024.0).astype(np.int64)
    key = (key3[:, 0] << 42) | ((key3[:, 1] & 0x1FFFFF) << 21) | (
        key3[:, 2] & 0x1FFFFF
    )
    _, uniq_idx, inv = np.unique(key, return_index=True, return_inverse=True)
    verts_w = verts[uniq_idx]
    faces_w = inv.reshape(-1)[faces]
    # drop degenerate faces
    ok = (
        (faces_w[:, 0] != faces_w[:, 1])
        & (faces_w[:, 1] != faces_w[:, 2])
        & (faces_w[:, 0] != faces_w[:, 2])
    )
    faces_w = faces_w[ok]
    return verts_w, faces_w


def marching_tetrahedra(sdf: np.ndarray, level: float = 0.0):
    """Extract the ``level`` iso-surface of a dense [N,N,N] SDF grid.

    Returns (verts [V,3] in voxel coordinates, faces [F,3] int64).  Triangles
    are oriented so normals point toward positive SDF."""
    n = sdf.shape[0]
    assert sdf.shape == (n, n, n)
    f = sdf - level

    # active-cube prefilter: only cubes whose corners change sign can emit
    # triangles — on a 256^3 grid this drops ~98% of the work
    m = n - 1
    neg = f < 0
    any_neg = np.zeros((m, m, m), bool)
    all_neg = np.ones((m, m, m), bool)
    for c in range(8):
        ox, oy, oz = _CORNER_OFF[c]
        cc = neg[ox : ox + m, oy : oy + m, oz : oz + m]
        any_neg |= cc
        all_neg &= cc
    active = any_neg & ~all_neg
    ai, aj, ak = np.nonzero(active)
    cube_origin = np.stack([ai, aj, ak], -1)     # [M,3]
    vals = np.empty((len(ai), 8), f.dtype)       # [M,8]
    for c in range(8):
        ox, oy, oz = _CORNER_OFF[c]
        vals[:, c] = f[ai + ox, aj + oy, ak + oz]
    return _march_cells(cube_origin, vals)


def marching_from_cells(
    ids: np.ndarray, vals: np.ndarray, size: int, level: float = 0.0
):
    """Marching tetrahedra directly on compact active cells — no dense
    [N,N,N] grid is ever touched (the 256³ prefilter scan is the host-side
    wall of mesh extraction; the device already found the active cells).

    ``ids [cap]`` flat cell ids into the (size-1)³ cell grid (-1 = pad),
    ``vals [cap, 8]`` corner values in x-major corner order — the layout
    produced by ``sdf._active_cells``.  Output identical to
    ``marching_tetrahedra`` on the reassembled grid."""
    m = size - 1
    ok = ids >= 0
    ci = ids[ok].astype(np.int64)
    origin = np.stack([ci // (m * m), (ci // m) % m, ci % m], -1)
    return _march_cells(origin, vals[ok].astype(np.float64) - level)



_FACE_DIRS = np.array(
    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    np.int64,
)


def voxel_to_cube_mesh(occ: np.ndarray, threshold: float = 0.4):
    """Boundary-face cube mesh of a dense occupancy grid, scaled to [-1, 1]
    (== `ldm_diffusion_util.py:345-446` voxel2mesh, used by
    ``export_octree``).  Returns (verts, faces)."""
    dim = occ.shape[0]
    solid = occ > threshold
    pad = np.zeros((dim + 2,) * 3, bool)
    pad[1:-1, 1:-1, 1:-1] = solid
    verts_list, faces_list = [], []
    vcount = 0
    # unit-square corner loops per face direction (outward CCW)
    for d, (dx, dy, dz) in enumerate(_FACE_DIRS):
        nb = np.roll(pad, shift=(-dx, -dy, -dz), axis=(0, 1, 2))
        exposed = pad & ~nb
        ii, jj, kk = np.nonzero(exposed)
        if len(ii) == 0:
            continue
        base = np.stack([ii - 1, jj - 1, kk - 1], -1).astype(np.float64)
        axis = d // 2
        hi = d % 2 == 0
        u, v = [a for a in range(3) if a != axis]
        corners = np.zeros((4, 3))
        corners[:, axis] = 1.0 if hi else 0.0
        uv = [(0, 0), (1, 0), (1, 1), (0, 1)]
        for c, (cu, cv) in enumerate(uv):
            corners[c, u] = cu
            corners[c, v] = cv
        quad = base[:, None, :] + corners[None, :, :]  # [F,4,3]
        n = quad.shape[0]
        verts_list.append(quad.reshape(-1, 3))
        idx = np.arange(n)[:, None] * 4 + vcount
        if hi != (axis == 1):  # orientation flip keeps normals outward
            tris = np.concatenate(
                [idx + [[0, 1, 2]], idx + [[0, 2, 3]]], axis=0
            )
        else:
            tris = np.concatenate(
                [idx + [[0, 2, 1]], idx + [[0, 3, 2]]], axis=0
            )
        faces_list.append(tris)
        vcount += 4 * n
    if not verts_list:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    verts = np.concatenate(verts_list) * (2.0 / dim) - 1.0
    faces = np.concatenate(faces_list).astype(np.int64)
    return verts, faces


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    with open(path, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in faces:
            fh.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")


def load_obj(path: str):
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:4]]
                faces.append(idx)
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


def save_ply_points(path: str, points: np.ndarray, normals=None):
    n = points.shape[0]
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {n}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        if normals is not None:
            fh.write("property float nx\nproperty float ny\nproperty float nz\n")
        fh.write("end_header\n")
        for i in range(n):
            row = list(points[i])
            if normals is not None:
                row += list(normals[i])
            fh.write(" ".join(f"{x:.6f}" for x in row) + "\n")


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int, seed=0,
                   return_normals: bool = False):
    """Area-weighted uniform surface samples (replaces
    trimesh.sample.sample_surface for the eval protocol,
    `metrics/generate_pointclouds.py:23-37`)."""
    rng = np.random.RandomState(seed)
    tri = verts[faces]
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=-1)
    total = area.sum()
    if total <= 0 or len(faces) == 0:
        pts = np.zeros((n, 3))
        return (pts, np.zeros((n, 3))) if return_normals else pts
    probs = area / total
    fi = rng.choice(len(faces), size=n, p=probs)
    r1 = np.sqrt(rng.uniform(size=n))
    r2 = rng.uniform(size=n)
    a, b, c = tri[fi, 0], tri[fi, 1], tri[fi, 2]
    pts = (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b + (
        r1 * r2
    )[:, None] * c
    if return_normals:
        nrm = cross[fi]
        nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True),
                               1e-12)
        return pts, nrm
    return pts
