"""Marching-tetrahedra and mesh IO tests."""

import os

import numpy as np

from octfusion_tpu.utils import mesh


def sphere_sdf(n, r=0.6):
    coord = (np.arange(n) + 0.5) / n * 2 - 1
    g = np.stack(np.meshgrid(coord, coord, coord, indexing="ij"), -1)
    return np.linalg.norm(g, axis=-1) - r


def test_marching_tetrahedra_sphere():
    n = 33
    sdf = sphere_sdf(n)
    verts, faces = mesh.marching_tetrahedra(sdf, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    # vertices lie near the sphere of radius r (in voxel coords)
    centre = (n - 1) / 2
    # grid voxel i has coordinate (i + .5)/n*2-1; invert for radius check
    pts = (verts + 0.5) / n * 2 - 1
    rad = np.linalg.norm(pts, axis=-1)
    assert np.abs(rad - 0.6).max() < 0.08
    assert np.abs(rad - 0.6).mean() < 0.02
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)
    # normals point outward (positive SDF side)
    tri = pts[faces]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    cent = tri.mean(1)
    outward = np.sum(nrm * cent, -1) > 0
    assert outward.mean() > 0.95
    del centre


def test_obj_roundtrip(tmp_path):
    sdf = sphere_sdf(17)
    verts, faces = mesh.marching_tetrahedra(sdf, 0.0)
    p = os.path.join(tmp_path, "m.obj")
    mesh.save_obj(p, verts, faces)
    v2, f2 = mesh.load_obj(p)
    assert v2.shape == verts.shape and f2.shape == faces.shape
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_sample_surface():
    sdf = sphere_sdf(33)
    verts, faces = mesh.marching_tetrahedra(sdf, 0.0)
    pts = mesh.sample_surface(verts, faces, 2048, seed=1)
    assert pts.shape == (2048, 3)
    n = 33
    r = np.linalg.norm((pts + 0.5) / n * 2 - 1, axis=-1)
    assert np.abs(r - 0.6).mean() < 0.03


def test_winding_number_signs():
    """Generalized winding number classifies inside/outside correctly, even
    with a hole in the mesh (where the nearest-normal heuristic breaks)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from prepare_dataset import winding_number

    from octfusion_tpu.utils import mesh as mesh_utils

    n = 25
    coord = (np.arange(n) + 0.5) / n * 2 - 1
    g = np.stack(np.meshgrid(coord, coord, coord, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.6
    v, f = mesh_utils.marching_tetrahedra(sdf, 0.0)
    v = (v + 0.5) / n * 2 - 1

    rng = np.random.RandomState(0)
    q = rng.uniform(-0.9, 0.9, size=(300, 3)).astype(np.float32)
    r = np.linalg.norm(q, axis=-1)
    clear = np.abs(r - 0.6) > 0.1
    w = winding_number(v, f, q)
    inside = w > 0.5
    np.testing.assert_array_equal(inside[clear], (r < 0.6)[clear])

    # open mesh: drop faces near the +z pole; points well away from the
    # hole must still classify correctly
    keep = v[f].mean(1)[:, 2] < 0.45
    f2 = f[keep]
    w2 = winding_number(v, f2, q)
    far = clear & (q[:, 2] < 0.2)
    np.testing.assert_array_equal((w2 > 0.5)[far], (r < 0.6)[far])


def test_marching_from_cells_matches_grid():
    """Cell-level marching equals the grid marcher on identical cells."""
    n = 33
    sdf = sphere_sdf(n).astype(np.float32)
    v1, f1 = mesh.marching_tetrahedra(sdf, 0.0)
    m = n - 1
    corners = np.stack(
        [sdf[dx:m + dx, dy:m + dy, dz:m + dz]
         for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)], -1
    )
    act = (corners.min(-1) <= 0) & (corners.max(-1) >= 0)
    ids = np.nonzero(act.reshape(-1))[0].astype(np.int32)
    vals = corners.reshape(-1, 8)[ids]
    # pad with -1 ids like the device transfer does
    ids_p = np.concatenate([ids, np.full(7, -1, np.int32)])
    vals_p = np.concatenate([vals, np.zeros((7, 8), np.float32)])
    v2, f2 = mesh.marching_from_cells(ids_p, vals_p, n, 0.0)
    assert v1.shape == v2.shape and f1.shape == f2.shape
    k1, k2 = np.lexsort(v1.T), np.lexsort(v2.T)
    np.testing.assert_allclose(v1[k1], v2[k2], atol=1e-9)
    # orientation: normals outward on the sphere
    pts = (v2 + 0.5) / n * 2 - 1
    tri = pts[f2]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    assert (np.sum(nrm * tri.mean(1), -1) > 0).mean() > 0.99
