"""Software shading-image renderers for FID evaluation.

The reference renders 20 fixed views at 299^2 with pyrender/EGL
(`/root/reference/utils/render/render.py:10-30`,
`utils/render_utils.py:14-23`: unit-sphere normalisation, perspective
camera yfov=pi/3 at distance 2, flat shading, camera-attached lights).
Neither GL nor pyrender exists in this image, so we ship two dependency-free
CPU renderers:

* ``render_mesh_views_raster`` (default for FID) — a true z-buffered
  *triangle* rasteriser with flat Lambertian shading: mesh defects (holes,
  flipped or missing faces) are visible in the image statistic, matching
  the reference protocol in kind;
* ``render_mesh_views`` — the round-1 point-splat fallback (dense surface
  samples, z-buffered), kept for speed comparisons.
"""

from __future__ import annotations

import numpy as np

from ..utils import mesh as mesh_utils

# The reference's 20 fixed view directions (icosahedral; camera = dir * 2,
# `utils/render/render.py:10-30`) — defining constants of the protocol.
FRONT_VECTORS = np.array([
    [0.52573, 0.38197, 0.85065], [-0.20081, 0.61803, 0.85065],
    [-0.64984, 0.00000, 0.85065], [-0.20081, -0.61803, 0.85065],
    [0.52573, -0.38197, 0.85065], [0.85065, -0.61803, 0.20081],
    [1.0515, 0.00000, -0.20081], [0.85065, 0.61803, 0.20081],
    [0.32492, 1.00000, -0.20081], [-0.32492, 1.00000, 0.20081],
    [-0.85065, 0.61803, -0.20081], [-1.0515, 0.00000, 0.20081],
    [-0.85065, -0.61803, -0.20081], [-0.32492, -1.00000, 0.20081],
    [0.32492, -1.00000, -0.20081], [0.64984, 0.00000, -0.85065],
    [0.20081, 0.61803, -0.85065], [-0.52573, 0.38197, -0.85065],
    [-0.52573, -0.38197, -0.85065], [0.20081, -0.61803, -0.85065],
], np.float64)


def scale_to_unit_sphere(verts: np.ndarray) -> np.ndarray:
    """Reference normalisation (`utils/util.py` scale_to_unit_sphere):
    centre on the bbox midpoint, scale the max radius to 1."""
    centre = (verts.min(0) + verts.max(0)) / 2
    v = verts - centre
    r = np.max(np.linalg.norm(v, axis=-1))
    return v / max(r, 1e-12)


def render_mesh_views_raster(
    verts: np.ndarray,
    faces: np.ndarray,
    image_size: int = 299,
    n_views: int = 20,
    cam_dist: float = 2.0,
    yfov: float = np.pi / 3.0,
    face_chunk: int = 65536,
) -> np.ndarray:
    """-> [n_views, S, S] float images in [0, 1].

    Flat-shaded perspective triangle rasterisation with a per-pixel nearest
    (z-buffer) resolve, camera-headlight Lambertian shading — the software
    equivalent of the reference's pyrender setup (flat `smooth=False` mesh,
    lights at the camera, `render_utils.py:88-99,121`)."""
    out = np.zeros((n_views, image_size, image_size), np.float32)
    if len(faces) == 0:
        return out
    v = scale_to_unit_sphere(np.asarray(verts, np.float64))
    f = np.asarray(faces, np.int64)
    tri_n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    tri_n /= np.maximum(np.linalg.norm(tri_n, axis=-1, keepdims=True), 1e-12)

    focal = (image_size / 2.0) / np.tan(yfov / 2.0)
    half = image_size / 2.0
    dirs = FRONT_VECTORS / np.linalg.norm(FRONT_VECTORS, axis=-1,
                                          keepdims=True)
    for vi in range(min(n_views, len(dirs))):
        # the reference places cameras at the UNNORMALISED front * 2
        # (`utils/render/render.py:10-33`, |front| ~ 1.07 -> dist ~ 2.14);
        # only the Lambertian light direction uses the normalised vector
        eye = FRONT_VECTORS[vi] * cam_dist
        rot = _look_at(eye)
        cam = (v - eye) @ rot.T                    # camera frame, -z fwd
        z = -cam[:, 2]
        sx = cam[:, 0] / np.maximum(z, 1e-6) * focal + half
        sy = -cam[:, 1] / np.maximum(z, 1e-6) * focal + half
        depth = np.full((image_size * image_size,), np.inf, np.float64)
        shade = np.zeros((image_size * image_size,), np.float64)
        lam = np.abs(tri_n @ dirs[vi])             # headlight Lambertian
        for c0 in range(0, len(f), face_chunk):
            fc = f[c0:c0 + face_chunk]
            tx = sx[fc]                            # [Tc, 3]
            ty = sy[fc]
            tz = z[fc]
            ok = (tz > 1e-4).all(axis=1)
            x0 = np.clip(np.floor(tx.min(1)), 0, image_size - 1).astype(int)
            x1 = np.clip(np.ceil(tx.max(1)), 0, image_size - 1).astype(int)
            y0 = np.clip(np.floor(ty.min(1)), 0, image_size - 1).astype(int)
            y1 = np.clip(np.ceil(ty.max(1)), 0, image_size - 1).astype(int)
            w = np.where(ok, x1 - x0 + 1, 0)
            h = np.where(ok, y1 - y0 + 1, 0)
            counts = w * h
            total = int(counts.sum())
            if total == 0:
                continue
            tri_id = np.repeat(np.arange(len(fc)), counts)
            # per-pair pixel coordinates inside each bbox
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            local = np.arange(total) - np.repeat(starts, counts)
            px = x0[tri_id] + local % np.maximum(w[tri_id], 1)
            py = y0[tri_id] + local // np.maximum(w[tri_id], 1)
            # barycentric inside test at pixel centres
            ax, ay = tx[tri_id, 0], ty[tri_id, 0]
            bx, by = tx[tri_id, 1], ty[tri_id, 1]
            cx, cy = tx[tri_id, 2], ty[tri_id, 2]
            pxf = px + 0.5
            pyf = py + 0.5
            d00x, d00y = bx - ax, by - ay
            d01x, d01y = cx - ax, cy - ay
            den = d00x * d01y - d01x * d00y
            good = np.abs(den) > 1e-12
            den = np.where(good, den, 1.0)
            wpx, wpy = pxf - ax, pyf - ay
            u = (wpx * d01y - d01x * wpy) / den
            t = (d00x * wpy - wpx * d00y) / den
            inside = good & (u >= 0) & (t >= 0) & (u + t <= 1)
            zz = (
                tz[tri_id, 0] * (1 - u - t)
                + tz[tri_id, 1] * u
                + tz[tri_id, 2] * t
            )
            inside &= zz > 1e-4
            pix = py * image_size + px
            pix = pix[inside]
            if pix.size == 0:
                continue
            zz = zz[inside]
            sh = lam[c0 + tri_id[inside]]
            # nearest-per-pixel within the chunk, then merge with the buffer
            order = np.lexsort((zz, pix))
            pix_s = pix[order]
            first = np.concatenate([[True], pix_s[1:] != pix_s[:-1]])
            sel = order[first]
            closer = zz[sel] < depth[pix[sel]]
            upd = sel[closer]
            depth[pix[upd]] = zz[upd]
            shade[pix[upd]] = sh[upd]
        out[vi] = shade.reshape(image_size, image_size).astype(np.float32)
    return out


def icosahedral_views(n: int = 20) -> np.ndarray:
    """Unit view directions: the 20 face centres of an icosahedron."""
    phi = (1 + 5**0.5) / 2
    verts = []
    for a in (-1, 1):
        for b in (-phi, phi):
            verts += [(0, a, b), (a, b, 0), (b, 0, a)]
    verts = np.unique(np.round(np.asarray(verts, np.float64), 6), axis=0)
    # faces of the icosahedron = triplets of mutually nearest vertices;
    # face centres = normalised sums.  Use a convex-hull-free trick: all
    # triples at the minimal pairwise distance.
    from itertools import combinations

    d2 = ((verts[:, None] - verts[None]) ** 2).sum(-1)
    edge = np.isclose(d2, np.sort(np.unique(np.round(d2, 6)))[1])
    centres = []
    for i, j, k in combinations(range(len(verts)), 3):
        if edge[i, j] and edge[j, k] and edge[i, k]:
            c = verts[i] + verts[j] + verts[k]
            centres.append(c / np.linalg.norm(c))
    centres = np.asarray(centres)
    assert len(centres) == 20, len(centres)
    return centres[:n]


def _look_at(eye: np.ndarray):
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(fwd, up)) > 0.98:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    return np.stack([right, up2, -fwd])  # rows: camera axes


def render_mesh_views(
    verts: np.ndarray,
    faces: np.ndarray,
    image_size: int = 299,
    n_views: int = 20,
    n_samples: int = 400_000,
    radius: float = 2.2,
    seed: int = 0,
) -> np.ndarray:
    """-> [n_views, S, S] float images in [0, 1] (Lambertian shading)."""
    if len(faces) == 0:
        return np.zeros((n_views, image_size, image_size), np.float32)
    pts = mesh_utils.sample_surface(verts, faces, n_samples, seed=seed)
    # per-sample normals from their triangles (resample to recover face ids)
    rng = np.random.RandomState(seed)
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    )
    probs = area / max(area.sum(), 1e-12)
    fi = rng.choice(len(faces), size=n_samples, p=probs)
    r1 = np.sqrt(rng.uniform(size=n_samples))
    r2 = rng.uniform(size=n_samples)
    a, b, c = tri[fi, 0], tri[fi, 1], tri[fi, 2]
    pts = (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b + (
        r1 * r2
    )[:, None] * c
    nrm = np.cross(tri[fi, 1] - tri[fi, 0], tri[fi, 2] - tri[fi, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)

    # normalise into the unit sphere
    centre = (pts.min(0) + pts.max(0)) / 2
    scale = np.max(np.linalg.norm(pts - centre, axis=-1))
    pts = (pts - centre) / max(scale, 1e-9)

    views = icosahedral_views(n_views)
    out = np.zeros((n_views, image_size, image_size), np.float32)
    for vi, direction in enumerate(views):
        eye = direction * radius
        rot = _look_at(eye)
        cam = (pts - eye) @ rot.T            # camera coords, -z forward
        z = -cam[:, 2]
        ok = z > 1e-3
        f = image_size / 1.1                  # fov covering the unit sphere
        x = cam[:, 0] / z * f + image_size / 2
        y = -cam[:, 1] / z * f + image_size / 2
        xi = np.clip(x.astype(np.int64), 0, image_size - 1)
        yi = np.clip(y.astype(np.int64), 0, image_size - 1)
        shade = np.abs(nrm @ direction)       # headlight Lambertian
        pix = yi * image_size + xi
        order = np.lexsort((z, pix))          # per-pixel nearest wins
        pix_s = pix[order]
        first = np.concatenate([[True], pix_s[1:] != pix_s[:-1]])
        sel = order[first & ok[order]]
        img = np.zeros((image_size * image_size,), np.float32)
        img[pix[sel]] = shade[sel].astype(np.float32)
        out[vi] = img.reshape(image_size, image_size)
    return out
