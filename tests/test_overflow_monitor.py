"""Continuous overflow detection (VERDICT r2 weak #3 / next #6):

* the train loop's OverflowMonitor must raise at a *print* step even when
  the overflow happened at a non-print step in between;
* the loader-side pre-filter must reject samples on *edge* capacity too,
  using the exact host-side dual-graph edge counter (cross-checked against
  the device build).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from octfusion_tpu.utils.overflow import OverflowMonitor


def test_monitor_raises_for_nonprint_step_overflow():
    mon = OverflowMonitor()
    print_freq = 5
    # steps 0..4: overflow only at step 2 (a non-print step)
    for it in range(5):
        ld = {"overflow": jnp.asarray(1.0 if it == 2 else 0.0)}
        mon.update(ld)
        if it % print_freq == 0:
            mon.check()  # step 0: nothing yet
    with pytest.raises(RuntimeError, match="capacity overflow"):
        mon.check()  # next print (or shutdown) sees the accumulated flag


def test_monitor_quiet_without_overflow():
    mon = OverflowMonitor()
    for _ in range(7):
        mon.update({"overflow": jnp.asarray(0.0)})
    mon.check()
    mon.update({})  # solvers without the key are fine
    mon.check()


def test_host_edge_counts_match_device_build():
    """dual_graph_edge_counts == the carried edge counts the device build
    checks against e_cap (GraphLevel.n_edges minus the per-vertex self
    loops)."""
    from octfusion_tpu.data.dataset import (SyntheticDataset,
                                            dual_graph_edge_counts)
    from octfusion_tpu.octree.dual_graph import build_dual_graph
    from octfusion_tpu.octree.octree import OctreeSpec, build_octree

    depth, fd = 5, 2
    ds = SyntheticDataset(size=3, point_sample_num=32, points_per_shape=2048)
    for i in range(2):
        pts = ds[i]["points"]
        spec = OctreeSpec.create(depth, fd, 1, finest_cap_per_sample=32768,
                                 decay=1.0)
        o = build_octree(jnp.asarray(pts), jnp.asarray(ds[i]["normals"]),
                         spec)
        g = build_dual_graph(o, edge_factor=16)
        assert not bool(g.any_overflow())
        host = dual_graph_edge_counts(pts, depth, fd)
        for d in range(fd, depth + 1):
            lvl = g.level(d)
            carried_dev = int(lvl.n_edges) - int(lvl.n_nodes)
            assert host[d] == carried_dev, (i, d, host[d], carried_dev)


def test_fits_capacity_rejects_on_edges():
    from octfusion_tpu.data.dataset import SyntheticDataset, fits_capacity
    from octfusion_tpu.octree.octree import OctreeSpec

    ds = SyntheticDataset(size=1, point_sample_num=32, points_per_shape=2048)
    pts = ds[0]["points"]
    spec = OctreeSpec.create(4, 2, 1, finest_cap_per_sample=32768, decay=1.0)
    assert fits_capacity(pts, spec)                     # node caps generous
    assert fits_capacity(pts, spec, edge_factor=16)     # edges fit at 16
    assert not fits_capacity(pts, spec, edge_factor=1)  # ~7/vertex > 1


def test_sampler_noise_stream_length_check():
    from octfusion_tpu.diffusion import sampler as S
    from octfusion_tpu.diffusion.schedule import alpha_cosine_log_snr

    def denoise(x, t, sc):
        return x * 0.5

    import jax

    key = jax.random.PRNGKey(0)
    short = np.zeros((1, 2, 3), np.float32)  # only the initial state
    with pytest.raises(ValueError, match="noise_stream"):
        S.sample_loop(denoise, key, (2, 3), 1, steps=4,
                      log_snr_fn=alpha_cosine_log_snr, df_type="x0",
                      noise_stream=short)
    # eps and DDIM(eta=0) paths legitimately need only entry 0
    S.sample_loop(denoise, key, (2, 3), 1, steps=4,
                  log_snr_fn=alpha_cosine_log_snr, df_type="eps",
                  noise_stream=short)
    S.sample_loop(denoise, key, (2, 3), 1, steps=4,
                  log_snr_fn=alpha_cosine_log_snr, df_type="x0", eta=0.0,
                  noise_stream=short)
