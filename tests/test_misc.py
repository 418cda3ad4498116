"""Misc solidity tests: determinism, lookup tables, EMA, loader."""

import numpy as np
import jax
import jax.numpy as jnp

from octfusion_tpu.diffusion import ema, sampler, schedule
from octfusion_tpu.octree.octree import OctreeSpec, build_octree


def test_lookup_table_roundtrip():
    rng = np.random.RandomState(0)
    v = rng.normal(size=(300, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    spec = OctreeSpec.create(4, 2, 1, finest_cap_per_sample=2048, decay=1.0)
    o = build_octree(
        jnp.asarray((0.6 * v).astype(np.float32)),
        jnp.asarray(v.astype(np.float32)), spec,
    )
    for d in range(2, 5):
        table = np.asarray(o.lookup_table(d))
        nn = int(o.nnum[d])
        keys = np.asarray(o.keys[d][:nn])
        # every valid node maps back to its slot
        np.testing.assert_array_equal(table[keys], np.arange(nn))
        # absent addresses are -1
        absent = np.setdiff1d(np.arange(8**d), keys)
        assert (table[absent] == -1).all()


def test_sampler_determinism():
    key = jax.random.PRNGKey(3)

    def denoise(x, tb, xs):
        return 0.1 * x

    a = sampler.sample_loop(
        denoise, key, (2, 8, 8), 2, steps=5,
        log_snr_fn=schedule.beta_linear_log_snr, df_type="eps",
    )
    b = sampler.sample_loop(
        denoise, key, (2, 8, 8), 2, steps=5,
        log_snr_fn=schedule.beta_linear_log_snr, df_type="eps",
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sampler.sample_loop(
        denoise, jax.random.PRNGKey(4), (2, 8, 8), 2, steps=5,
        log_snr_fn=schedule.beta_linear_log_snr, df_type="eps",
    )
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_ema_update():
    p = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2,))}}
    e = {"a": jnp.zeros((3,)), "b": {"c": jnp.ones((2,))}}
    out = ema.ema_update(e, p, beta=0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1)
    np.testing.assert_allclose(np.asarray(out["b"]["c"]), 0.9)


def test_infinite_loader_batches():
    from octfusion_tpu.data.dataset import SyntheticDataset
    from octfusion_tpu.data.loader import DataLoader

    ds = SyntheticDataset(size=6, point_sample_num=32, points_per_shape=256)
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    it = iter(dl)
    seen = []
    for _ in range(5):
        b = next(it)
        assert b["points"].shape == (2, 256, 3)
        assert b["pos"].shape == (2, 32, 3)
        seen.extend(b["filename"])
    dl.stop()
    assert len(set(seen)) > 2  # shuffling across the dataset
