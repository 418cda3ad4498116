"""Metrics tests: JAX Chamfer/EMD vs C++ oracle vs scipy exact matching."""

import numpy as np
import jax.numpy as jnp
import pytest

from octfusion_tpu.metrics import distances, evaluation


def clouds(b=2, n=64, m=48, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.uniform(-1, 1, size=(b, n, 3)).astype(np.float32),
        rng.uniform(-1, 1, size=(b, m, 3)).astype(np.float32),
    )


def test_chamfer_vs_numpy():
    a, b = clouds()
    dl, dr = distances.chamfer(jnp.asarray(a), jnp.asarray(b))
    d = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dl), d.min(2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr), d.min(1), rtol=1e-4, atol=1e-5)


def test_chamfer_vs_native():
    native = pytest.importorskip("octfusion_tpu.metrics.native")
    try:
        native.load()
    except Exception as e:  # toolchain missing
        pytest.skip(f"native build failed: {e}")
    a, b = clouds(seed=1)
    d1, i1, d2, i2 = native.nn_distance(a, b)
    dl, dr = distances.chamfer(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(dl), d1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr), d2, rtol=1e-4, atol=1e-5)


def test_emd_vs_native_and_exact():
    native = pytest.importorskip("octfusion_tpu.metrics.native")
    try:
        native.load()
    except Exception as e:
        pytest.skip(f"native build failed: {e}")
    a, b = clouds(b=2, n=32, m=32, seed=2)
    # JAX vs C++ (same algorithm -> tight agreement)
    _, cost_native = native.approx_match_cost(a, b)
    cost_jax = np.asarray(distances.emd_approx(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(cost_jax, cost_native, rtol=2e-3, atol=1e-4)

    # both approximate the exact assignment (scipy Hungarian) from above
    from scipy.optimize import linear_sum_assignment

    for i in range(a.shape[0]):
        d = np.sqrt(((a[i][:, None] - b[i][None]) ** 2).sum(-1))
        r, c = linear_sum_assignment(d)
        exact = d[r, c].mean()
        assert cost_jax[i] >= exact - 1e-4
        assert cost_jax[i] <= exact * 1.6 + 1e-3, (cost_jax[i], exact)


def test_emd_bf16_store_matches_fp32():
    # the HBM-saving bf16 auction option (used by tools/evaluate.py
    # --emd_bf16) must stay within a fraction of approxmatch's own ~2%
    # algorithmic error vs exact EMD
    a, b = clouds(b=4, n=128, m=128, seed=7)
    e32 = np.asarray(distances.emd_approx(jnp.asarray(a), jnp.asarray(b)))
    e16 = np.asarray(
        distances.emd_approx(
            jnp.asarray(a), jnp.asarray(b), store_dtype=jnp.bfloat16
        )
    )
    assert e16.dtype == np.float32  # cost reduction is fp32
    np.testing.assert_allclose(e16, e32, rtol=5e-3)


def test_emd_bf16_store_matches_fp32_at_eval_scale():
    """bf16 parity pinned at USE scale: 2048-point eval clouds (where
    exp(level*d2) sharpness amplifies bf16 rounding of d2), plus the
    near-duplicate-cloud regime (the M_ss diagonal path, d2 ~ 0 where
    relative bf16 error of tiny distances is largest)."""
    a, b = clouds(b=1, n=2048, m=2048, seed=11)
    e32 = np.asarray(distances.emd_approx(jnp.asarray(a), jnp.asarray(b)))
    e16 = np.asarray(distances.emd_approx(
        jnp.asarray(a), jnp.asarray(b), store_dtype=jnp.bfloat16))
    np.testing.assert_allclose(e16, e32, rtol=2.5e-3)

    # near-duplicate clouds: jitter ~1e-3 of the cloud extent
    rng = np.random.RandomState(13)
    a2 = a + rng.normal(scale=1e-3, size=a.shape).astype(a.dtype)
    d32 = np.asarray(distances.emd_approx(jnp.asarray(a), jnp.asarray(a2)))
    d16 = np.asarray(distances.emd_approx(
        jnp.asarray(a), jnp.asarray(a2), store_dtype=jnp.bfloat16))
    # small absolute costs: compare with a matched absolute floor
    np.testing.assert_allclose(d16, d32, rtol=2.5e-3, atol=1e-5)


def test_emd_identical_clouds_near_zero():
    a, _ = clouds(b=1, n=40, m=40, seed=3)
    cost = float(distances.emd_approx(jnp.asarray(a), jnp.asarray(a))[0])
    assert cost < 1e-2, cost


def test_1nna_and_cov_mmd():
    rng = np.random.RandomState(4)
    # identical distributions -> 1-NNA near 0.5; disjoint -> near 1.0
    s = rng.normal(size=(40, 16, 3)).astype(np.float32)
    r = rng.normal(size=(40, 16, 3)).astype(np.float32)
    res = evaluation.evaluate_point_sets(s, r, batch=8, emd=False)
    assert 0.3 < res["1nna_cd"] < 0.75, res
    far = r + 10.0
    res2 = evaluation.evaluate_point_sets(s, far, batch=8, emd=False)
    assert res2["1nna_cd"] > 0.95
    assert res2["mmd_cd"] > res["mmd_cd"]
    # cov of identical sets is high
    res3 = evaluation.evaluate_point_sets(s, s.copy(), batch=8, emd=False)
    assert res3["cov_cd"] == 1.0


def test_chamfer_pallas_interpret():
    """Pallas kernel parity in interpreter mode (compiled-mode parity +
    timing is exercised on the TPU; see PERF.md)."""
    import jax.numpy as jnp

    from octfusion_tpu.ops.pallas.chamfer_kernel import chamfer_pallas

    a, b = clouds(b=2, n=700, m=1100, seed=5)
    dl, dr = chamfer_pallas(jnp.asarray(a), jnp.asarray(b), interpret=True)
    d = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dl), d.min(2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr), d.min(1), rtol=1e-4, atol=1e-5)
