"""Golden-image pin for the FID raster renderer (VERDICT r2 weak #6).

The triangle rasteriser defines the shading-FID statistic; a silent change
in any convention (projection handedness, y-flip, camera distance, light
direction, z-resolve) would shift FID numbers without failing any
behavioural test.  This pins pixel-level output on a canonical
anisotropic octahedron (orientation-sensitive in every axis) for three
spread-out views against a checked-in golden array.

Protocol constants under test: the 20 icosahedral fronts with cameras at
the UNNORMALISED front * 2 (`/root/reference/utils/render/render.py:10-33`),
yfov pi/3, 299^2 default (64^2 here), flat Lambertian headlight
(`utils/render_utils.py:88-121`).

Regenerate (only after an INTENDED protocol change):
    python tests/test_render_golden.py
"""

import os

import numpy as np

from octfusion_tpu.metrics.render import render_mesh_views_raster

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "render_golden_octa.npy")
VIEWS = (0, 7, 16)


def _canonical_mesh():
    # octahedron squashed per-axis so no view is symmetry-equivalent
    verts = np.array([
        [1, 0, 0], [-1, 0, 0],
        [0, 0.7, 0], [0, -0.7, 0],
        [0, 0, 0.4], [0, 0, -0.4],
    ], np.float64)
    faces = np.array([
        [0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
        [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5],
    ], np.int64)
    return verts, faces


def _render():
    verts, faces = _canonical_mesh()
    imgs = render_mesh_views_raster(verts, faces, image_size=64)
    return imgs[list(VIEWS)].astype(np.float16)


def test_raster_matches_golden():
    got = _render()
    want = np.load(GOLDEN)
    assert got.shape == want.shape
    # float16 storage; renderer is deterministic float32 -> tiny tolerance
    diff = np.abs(got.astype(np.float32) - want.astype(np.float32))
    assert diff.max() <= 2e-3, (
        f"raster output drifted from golden (max |d|={diff.max():.4f}); "
        "if the protocol change is intended, regenerate via "
        "`python tests/test_render_golden.py`"
    )


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.save(GOLDEN, _render())
    print(f"wrote {GOLDEN}")
