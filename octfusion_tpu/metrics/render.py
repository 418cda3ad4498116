"""Software shading-image renderer for FID evaluation.

The reference renders 20 fixed icosahedral views at 299^2 with pyrender/EGL
(`/root/reference/utils/render/render.py:10-30`,
`utils/render_utils.py:14-23`).  Neither GL nor pyrender exists in this
image, so we ship a dependency-free point-splat renderer: dense
area-weighted surface samples are projected per view and z-buffered, pixels
shaded by Lambertian normal-dot-light — the same "shading image" statistic
family, deterministic and CPU-only.
"""

from __future__ import annotations

import numpy as np

from ..utils import mesh as mesh_utils


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
