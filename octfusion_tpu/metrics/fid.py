"""Frechet distance over image features (per-view shading FID,
`/root/reference/metrics/calc_fid.py:29-46`).

The feature extractor is pluggable: the reference uses clean-fid's
InceptionV3.  This image has no pretrained weights (zero egress), so pass
either a callable ``images [N,S,S] -> features [N,D]`` or set
``OCTFUSION_INCEPTION_WEIGHTS`` to a local torchvision inception checkpoint.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def _sqrtm(a: np.ndarray) -> np.ndarray:
    """scipy sqrtm across the ``disp`` deprecation (scipy >=1.16 returns
    just the matrix; older versions return ``(matrix, errest)``)."""
    import warnings

    from scipy import linalg

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # disp deprecation / LinAlgWarning
        out = linalg.sqrtm(a, disp=False)
    return out[0] if isinstance(out, tuple) else out


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (`calc_fid.py:29-46`).

    When either covariance is rank-deficient (fewer samples than feature
    dims — common at small eval sizes), ``sqrtm(sigma1 @ sigma2)`` is
    numerically unstable (scipy emits LinAlgWarning / returns non-finite
    values).  Like clean-fid, detect that case and retry with ``eps`` added
    to the diagonals so the product is safely positive-definite."""
    diff = mu1 - mu2
    # rank-deficiency pre-check: a covariance from n samples has rank
    # <= n-1, so small sets ALWAYS need the eps offset — apply it up front
    # rather than relying on sqrtm to fail loudly.
    n_dim = sigma1.shape[0]
    deficient = (
        np.linalg.matrix_rank(sigma1, hermitian=True) < n_dim
        or np.linalg.matrix_rank(sigma2, hermitian=True) < n_dim
    )
    if deficient:
        offset = np.eye(n_dim) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    else:
        covmean = _sqrtm(sigma1 @ sigma2)
        if not np.isfinite(covmean).all():
            offset = np.eye(n_dim) * eps
            covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def fid_from_features(feat1: np.ndarray, feat2: np.ndarray) -> float:
    mu1, s1 = feat1.mean(0), np.cov(feat1, rowvar=False)
    mu2, s2 = feat2.mean(0), np.cov(feat2, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)


def default_feature_extractor() -> Callable:
    """torchvision InceptionV3 from a local weights file, if available."""
    path = os.environ.get("OCTFUSION_INCEPTION_WEIGHTS")
    if not path or not os.path.exists(path):
        raise RuntimeError(
            "no Inception weights available (zero-egress image); set "
            "OCTFUSION_INCEPTION_WEIGHTS to a local torchvision "
            "inception_v3 state dict, or pass feature_fn explicitly"
        )
    import torch
    from torchvision.models import inception_v3

    net = inception_v3(weights=None, aux_logits=True, init_weights=False)
    net.load_state_dict(torch.load(path, map_location="cpu"))
    net.fc = torch.nn.Identity()
    net.eval()

    def feat(images: np.ndarray) -> np.ndarray:
        x = torch.tensor(images, dtype=torch.float32)[:, None].repeat(1, 3, 1, 1)
        x = torch.nn.functional.interpolate(
            x, size=(299, 299), mode="bilinear", align_corners=False
        )
        x = (x - 0.5) / 0.5
        with torch.no_grad():
            return net(x).numpy()

    feat.cache_tag = "inception_v3"
    return feat


def standin_feature_extractor(seed: int = 0, dim: int = 256,
                              image_size: int = 299) -> Callable:
    """Fixed-seed random-convnet features — a DOCUMENTED STAND-IN for
    InceptionV3 when no pretrained weights exist (zero-egress image).

    Random convolutional features are a recognised substitute basis for
    Frechet distances (the metric compares two sets under the SAME
    embedding, so any fixed non-degenerate feature map yields a valid
    relative distance; absolute values are NOT comparable to Inception-FID
    numbers).  Architecture: 4x [3x3 conv stride 2, relu] with fixed
    Gaussian weights, global mean+std pooling -> [N, dim].  Deterministic
    by (seed, dim); results must be reported as ``fid_standin``, never as
    FID."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    chans = [8, 16, 32, dim // 2]
    kernels = []
    cin = 1
    for k, cout in zip(ks, chans):
        w = jax.random.normal(k, (3, 3, cin, cout), jnp.float32)
        w = w / np.sqrt(9 * cin)
        kernels.append(w)
        cin = cout

    @jax.jit
    def net(x):  # [N, S, S] -> [N, dim]
        h = x[..., None]
        for w in kernels:
            h = jax.lax.conv_general_dilated(
                h, w, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.nn.relu(h)
        mean = h.mean(axis=(1, 2))
        std = h.std(axis=(1, 2))
        return jnp.concatenate([mean, std], axis=-1)

    def feat(images: np.ndarray) -> np.ndarray:
        return np.asarray(net(jnp.asarray(images, jnp.float32)))

    feat.cache_tag = f"standin_s{seed}_d{dim}"
    return feat


def per_view_fid(
    images1: np.ndarray,   # [N, V, S, S]
    images2: np.ndarray,   # [M, V, S, S]
    feature_fn: Optional[Callable] = None,
) -> float:
    """Average FID over the fixed views (`metrics/calc_fid.py:35-46`)."""
    feature_fn = feature_fn or default_feature_extractor()
    v = images1.shape[1]
    fids = []
    for vi in range(v):
        f1 = feature_fn(images1[:, vi])
        f2 = feature_fn(images2[:, vi])
        fids.append(fid_from_features(f1, f2))
    return float(np.mean(fids))


def render_mesh_set(paths, image_size: int = 299, n_views: int = 20
                    ) -> np.ndarray:
    """[N, V, S, S] shading images of a set of OBJ meshes via the software
    triangle rasteriser — the reference's ``generate_image_for_fid``
    pipeline (`utils/render_utils.py:14-23`) without pyrender/EGL."""
    from ..utils.mesh import load_obj
    from .render import render_mesh_views_raster

    out = []
    for p in paths:
        v, f = load_obj(p)
        out.append(
            render_mesh_views_raster(
                v, f, image_size=image_size, n_views=n_views
            )
        )
    return np.stack(out)


def mesh_set_features(paths, image_size: int = 299, n_views: int = 20,
                      feature_fn: Optional[Callable] = None,
                      cache_dir: Optional[str] = None) -> np.ndarray:
    """[N, V, D] per-view features of a mesh set, streamed one mesh at a
    time (constant memory; the single-host rasteriser is the cost, ~3 s per
    mesh x 20 views at 299^2).

    With ``cache_dir`` the per-mesh feature matrix is memoised on disk
    keyed by (basename, mtime, size, views, extractor ``cache_tag``) so a
    set scored against several sample sets — e.g. the fixed reference set —
    renders only once.  Extractors without a ``cache_tag`` never cache."""
    feature_fn = feature_fn or default_feature_extractor()
    from ..utils.mesh import load_obj
    from .render import render_mesh_views_raster

    tag = getattr(feature_fn, "cache_tag", None)
    if cache_dir and tag:
        os.makedirs(cache_dir, exist_ok=True)
    out = []
    # time-throttled heartbeat: rendering a 512-mesh set is ~25 min of
    # otherwise-silent single-host rasterisation
    import sys
    import time as _time

    t0 = _last = _time.time()
    for i, p in enumerate(paths):
        if _time.time() - _last > 30:
            _last = _time.time()
            rate = max(i, 1) / (_last - t0)
            sys.stderr.write(
                f"[fid render] {i}/{len(paths)} meshes "
                f"(eta {(len(paths) - i) / max(rate, 1e-9):.0f}s)\n")
            sys.stderr.flush()
        cpath = None
        if cache_dir and tag:
            st = os.stat(p)
            cpath = os.path.join(
                cache_dir,
                f"{os.path.basename(p)}-{int(st.st_mtime)}-{st.st_size}"
                f"-s{image_size}v{n_views}-{tag}.npy",
            )
            if os.path.exists(cpath):
                out.append(np.load(cpath))
                continue
        v, f = load_obj(p)
        imgs = render_mesh_views_raster(
            v, f, image_size=image_size, n_views=n_views
        )
        feats = feature_fn(imgs)
        if cpath:
            np.save(cpath, feats)
        out.append(feats)
    return np.stack(out)


def per_view_fid_from_features(f1: np.ndarray, f2: np.ndarray) -> float:
    """Average FID over views, features [N, V, D] (`calc_fid.py:35-46`)."""
    return float(np.mean([
        fid_from_features(f1[:, vi], f2[:, vi])
        for vi in range(f1.shape[1])
    ]))


def shading_fid(sample_paths, reference_paths, image_size: int = 299,
                n_views: int = 20,
                feature_fn: Optional[Callable] = None,
                cache_dir: Optional[str] = None,
                reference_cache_dir: Optional[str] = None) -> float:
    """End-to-end per-view shading FID between two mesh sets."""
    feature_fn = feature_fn or default_feature_extractor()
    f1 = mesh_set_features(sample_paths, image_size, n_views, feature_fn,
                           cache_dir=cache_dir)
    f2 = mesh_set_features(reference_paths, image_size, n_views, feature_fn,
                           cache_dir=reference_cache_dir or cache_dir)
    return per_view_fid_from_features(f1, f2)
