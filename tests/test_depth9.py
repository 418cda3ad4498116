"""Depth-9 (512^3 effective) operation: config parity + capacity scaling
smoke test (VERDICT r2 item #9).

The reference ships `configs/vae_snet_eval_depth984.yaml` (depth 9,
full_depth 4, depth_stop 8); `configs/vae_snet_depth984.yaml` mirrors it
with TPU capacities.  This test proves the capacity math and every layer
(octree build, dual graph, VAE encode, growing decode to depth 9) runs
past depth 8 — at tiny caps so it stays CPU-fast.
"""

import numpy as np
import jax
import jax.numpy as jnp

from octfusion_tpu import config as config_lib
from octfusion_tpu.octree.octree import OctreeSpec, build_octree
from octfusion_tpu.octree.dual_graph import build_dual_graph
from octfusion_tpu.nn.vae import GraphVAE, copy_topology_octree


def test_depth9_config_parses():
    cfg = config_lib.load_config("configs/vae_snet_depth984.yaml")
    m = cfg.model
    assert (m.depth, m.full_depth, m.depth_stop, m.depth_out) == (9, 4, 8, 9)
    assert m.channels[9] == 8 and m.channels[8] == 24
    spec = cfg.capacity.octree_spec(m.depth, m.full_depth, 1)
    assert spec.node_caps[9] == 524288
    # full levels exact, sparse levels monotone non-increasing going coarser
    assert spec.node_caps[4] == 8**4
    for d in range(5, 10):
        assert spec.node_caps[d] >= spec.node_caps[d - 1] or d <= 5
    # the int32 Morton key space covers depth 9 (30 bits needed at 10)
    from octfusion_tpu.octree import morton
    assert m.depth <= morton.MAX_DEPTH


def test_depth9_build_encode_decode_grow():
    """Sphere -> depth-9 octree -> graph to depth_stop 8 -> tiny VAE
    encode -> growing decode back out to depth 9, topology-consistent."""
    depth, full_depth, stop = 9, 3, 8
    rng = np.random.RandomState(0)
    v = rng.normal(size=(600, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # depth-9 cap must absorb 8 * nnum_nempty(8) during decode_grow: an
    # untrained VAE can predict 'split' on every depth-8 node, so give the
    # grown level 8x the depth-8 cap (the same headroom rule the real
    # configs apply via decay < 8)
    spec = OctreeSpec.create(
        depth, full_depth, 1,
        caps_override=(1, 8, 64, 512, 2048, 8192, 8192, 8192, 8192, 65536),
    )
    o = build_octree(
        jnp.asarray((0.6 * v).astype(np.float32)),
        jnp.asarray(v.astype(np.float32)), spec,
    )
    assert not bool(jnp.any(o.overflow))
    assert int(o.nnum[9]) > 0, "no depth-9 nodes built"

    g = build_dual_graph(o)
    for d in range(full_depth, depth + 1):
        assert not bool(g.level(d).overflow), d

    vae = GraphVAE(
        depth=depth, full_depth=full_depth, depth_stop=stop, depth_out=depth,
        embed_dim=2, resblk_num=1,
        channels=(4, 8, 8, 8, 8, 8, 8, 8, 8, 8),
        use_checkpoint=False,
    )
    key = jax.random.PRNGKey(0)
    params = vae.init(key, g, g, key)

    octree_small = copy_topology_octree(o, stop)
    g_small = build_dual_graph(octree_small, up_to=stop)

    def run(p):
        mean, _ = vae.apply(p, g, method=GraphVAE.encode)
        return vae.apply(p, mean, g_small, method=GraphVAE.decode_grow)

    out = jax.jit(run)(params)
    oc = out["octree_out"]
    # grown topology matches its own split predictions at the grown level
    label = np.asarray(jnp.argmax(out["logits"][stop], -1))
    nmask = np.asarray(oc.node_mask(stop))
    ne = np.asarray(oc.nempty_mask(stop))
    np.testing.assert_array_equal(ne[nmask], (label > 0)[nmask])
    assert int(oc.nnum[depth]) == 8 * int(oc.nnum_nempty[stop])


def test_depth10_config_and_build():
    """Depth-10 (1024^3, the reference's Objaverse eval ceiling,
    `configs/vae_obja_eval.yaml`): config parses, Morton keys cover it,
    and build -> dual graph -> encode -> growing decode runs at tiny caps."""
    cfg = config_lib.load_config("configs/vae_obja_depth1084.yaml")
    m = cfg.model
    assert (m.depth, m.full_depth, m.depth_stop, m.depth_out) == (
        10, 4, 8, 10)
    assert len(m.channels) == 11 and m.channels[10] == 8
    from octfusion_tpu.octree import morton
    assert m.depth == morton.MAX_DEPTH

    depth, full_depth, stop = 10, 3, 8
    rng = np.random.RandomState(1)
    v = rng.normal(size=(400, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    spec = OctreeSpec.create(
        depth, full_depth, 1,
        caps_override=(1, 8, 64, 512, 2048, 4096, 4096, 4096, 4096,
                       4096, 32768),
    )
    o = build_octree(
        jnp.asarray((0.55 * v).astype(np.float32)),
        jnp.asarray(v.astype(np.float32)), spec,
    )
    assert not bool(jnp.any(o.overflow))
    assert int(o.nnum[10]) > 0, "no depth-10 nodes built"
    # keys remain valid int32 (30 bits) and strictly sorted per batch
    k10 = np.asarray(o.keys[10])[: int(o.nnum[10])]
    assert k10.min() >= 0 and (np.diff(k10) > 0).all()

    g = build_dual_graph(o)
    for d in range(full_depth, depth + 1):
        assert not bool(g.level(d).overflow), d

    vae = GraphVAE(
        depth=depth, full_depth=full_depth, depth_stop=stop,
        depth_out=depth, embed_dim=2, resblk_num=1,
        channels=(4, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8),
        use_checkpoint=False,
    )
    key = jax.random.PRNGKey(0)
    params = vae.init(key, g, g, key)
    octree_small = copy_topology_octree(o, stop)
    g_small = build_dual_graph(octree_small, up_to=stop)

    def run(p):
        mean, _ = vae.apply(p, g, method=GraphVAE.encode)
        return vae.apply(p, mean, g_small, method=GraphVAE.decode_grow)

    out = jax.jit(run)(params)
    oc = out["octree_out"]
    assert int(oc.nnum[depth]) == 8 * int(oc.nnum_nempty[depth - 1])
