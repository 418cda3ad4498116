"""Offline dataset preparation: meshes -> reference-format training shards.

TPU-native counterpart of `/root/reference/tools/repair_mesh.py` (which
depends on the external mesh2sdf C++ extension, not present here).  For each
input OBJ it writes the per-shape directory layout the reference consumes
(`datasets/dualoctree_snet.py:110-168`):

    <out>/<shape>/pointcloud.npz   points, normals      (surface samples)
    <out>/<shape>/sdf.npz          points, sdf, grad    (SDF supervision)

SDF values come from nearest-surface-point distance (scipy cKDTree over a
dense surface sampling).  The sign comes from the generalized winding
number of the triangle mesh by default (robust for the non-watertight
ShapeNet meshes that motivated the reference's whole mesh2sdf repair step,
`repair_mesh.py:122-156`); ``--sign normal`` falls back to the cheaper
nearest-normal heuristic (exact only for clean watertight surfaces).

Usage:
    python tools/prepare_dataset.py --meshes 'data/raw/*.obj' \
        --out data/prepared --filelist data/prepared/filelist.txt
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def mesh_to_shards(
    mesh_path: str,
    out_dir: str,
    n_surface: int = 100_000,
    n_sdf: int = 100_000,
    mesh_scale: float = 0.8,
    point_scale: float = 0.5,
    near_std: float = 0.02,
    seed: int = 0,
    sign_method: str = "winding",
):
    from octfusion_tpu.utils import mesh as mesh_utils

    verts, faces = mesh_utils.load_obj(mesh_path)
    if len(faces) == 0:
        raise ValueError(f"{mesh_path}: empty mesh")
    # normalise into [-mesh_scale, mesh_scale] then shape scale
    centre = (verts.min(0) + verts.max(0)) / 2
    half = np.abs(verts - centre).max()
    verts = (verts - centre) / max(half, 1e-9) * mesh_scale * point_scale

    surf, nrm = mesh_utils.sample_surface(
        verts, faces, n_surface, seed=seed, return_normals=True
    )

    # SDF queries: near-surface + uniform volume (the reference samples
    # around octree nodes at depths 4-6, `repair_mesh.py:260-338`; the
    # near-surface Gaussian mixture covers the same region)
    rng = np.random.RandomState(seed + 1)
    n_near = n_sdf * 3 // 4
    near = surf[rng.randint(0, n_surface, n_near)] + rng.normal(
        0, near_std, size=(n_near, 3)
    )
    vol = rng.uniform(-point_scale, point_scale, size=(n_sdf - n_near, 3))
    queries = np.concatenate([near, vol]).astype(np.float32)

    from scipy.spatial import cKDTree

    tree = cKDTree(surf)
    dist, idx = tree.query(queries, k=1)
    diff = queries - surf[idx]
    if sign_method == "winding":
        w = winding_number(verts, faces, queries)
        sign = np.where(w > 0.5, -1.0, 1.0)
    else:
        sign = np.sign(np.sum(diff * nrm[idx], axis=-1))
        sign[sign == 0] = 1.0
    sdf = (dist * sign).astype(np.float32)
    grad = diff / np.maximum(dist[:, None], 1e-9) * sign[:, None]

    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, "pointcloud.npz"),
        points=surf.astype(np.float32), normals=nrm.astype(np.float32),
    )
    np.savez(
        os.path.join(out_dir, "sdf.npz"),
        points=queries, sdf=sdf, grad=grad.astype(np.float32),
    )


def winding_number(verts: np.ndarray, faces: np.ndarray,
                   queries: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """Generalized winding number of the mesh at each query (Jacobson et
    al.): w = sum of per-triangle solid angles / 4pi, robust inside/outside
    classification even for open or self-intersecting meshes (w degrades
    continuously instead of flipping).  Solid angle via van
    Oosterom-Strackee; chunked jax on CPU for throughput."""
    import jax
    import jax.numpy as jnp

    tri = jnp.asarray(verts[faces], jnp.float32)        # [T, 3, 3]

    @jax.jit
    def chunk_w(q):                                     # [C, 3]
        a = tri[None, :, 0] - q[:, None]                # [C, T, 3]
        b = tri[None, :, 1] - q[:, None]
        c = tri[None, :, 2] - q[:, None]
        la = jnp.linalg.norm(a, axis=-1)
        lb = jnp.linalg.norm(b, axis=-1)
        lc = jnp.linalg.norm(c, axis=-1)
        num = jnp.sum(a * jnp.cross(b, c), axis=-1)
        den = (
            la * lb * lc
            + jnp.sum(a * b, -1) * lc
            + jnp.sum(b * c, -1) * la
            + jnp.sum(c * a, -1) * lb
        )
        omega = 2.0 * jnp.arctan2(num, den)
        return jnp.sum(omega, axis=-1) / (4.0 * jnp.pi)

    out = np.empty((len(queries),), np.float32)
    for c0 in range(0, len(queries), chunk):
        q = jnp.asarray(queries[c0:c0 + chunk], jnp.float32)
        out[c0:c0 + len(q)] = np.asarray(chunk_w(q))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--meshes", required=True, help="glob of input OBJs")
    p.add_argument("--out", required=True)
    p.add_argument("--filelist", default=None)
    p.add_argument("--n_surface", type=int, default=100_000)
    p.add_argument("--n_sdf", type=int, default=100_000)
    p.add_argument("--point_scale", type=float, default=0.5)
    args = p.parse_args()

    paths = sorted(glob.glob(args.meshes))
    names = []
    for i, mp in enumerate(paths):
        name = os.path.splitext(os.path.basename(mp))[0]
        mesh_to_shards(
            mp, os.path.join(args.out, name),
            n_surface=args.n_surface, n_sdf=args.n_sdf,
            point_scale=args.point_scale, seed=i,
        )
        names.append(name)
        print(f"[{i + 1}/{len(paths)}] {name}")
    if args.filelist:
        os.makedirs(os.path.dirname(args.filelist) or ".", exist_ok=True)
        with open(args.filelist, "w") as fh:
            fh.write("\n".join(names) + "\n")


if __name__ == "__main__":
    main()
