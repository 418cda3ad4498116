"""Fused Pallas graph-conv: plan correctness + kernel parity (interpret
mode on CPU) against the XLA segment-sum path."""

import numpy as np
import jax
import jax.numpy as jnp

from octfusion_tpu.octree.octree import OctreeSpec, build_octree
from octfusion_tpu.octree.dual_graph import (N_EDGE_TYPE, build_dual_graph,
                                             with_conv_plans)
from octfusion_tpu.ops import graph_ops
from octfusion_tpu.ops.pallas.graph_conv_plan import (build_conv_plan,
                                                      plan_apply_reference)


def make_graph(seed=0, depth=4, full_depth=2, n=300, up_to=None):
    rng = np.random.RandomState(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = 0.55 + 0.2 * np.sin(4 * v[:, 0])
    spec = OctreeSpec.create(
        depth, full_depth, 1, finest_cap_per_sample=2048, decay=1.0
    )
    o = build_octree(
        jnp.asarray((r[:, None] * v).astype(np.float32)),
        jnp.asarray(v.astype(np.float32)), spec,
    )
    return build_dual_graph(o, 9, up_to=up_to or depth)


def xla_column_buffer(x, lvl):
    """The [G, 7C] column buffer of the XLA path (graph_ops internals)."""
    g, c = x.shape
    gathered = x[jnp.clip(lvl.edge_col, 0, g - 1)]
    gathered = gathered * lvl.edge_scale[:, None].astype(x.dtype)
    slots = jnp.where(
        lvl.edge_row < g,
        lvl.edge_row * N_EDGE_TYPE + lvl.edge_dir,
        g * N_EDGE_TYPE,
    )
    col = jax.ops.segment_sum(
        gathered, slots, num_segments=g * N_EDGE_TYPE, indices_are_sorted=True
    )
    return col.reshape(g, N_EDGE_TYPE * c)


def test_plan_matches_segment_column_buffer():
    g = make_graph()
    rng = np.random.RandomState(1)
    for d in (2, 3, 4):
        lvl = g.level(d)
        plan = build_conv_plan(lvl, 128, 56)
        assert not bool(plan.overflow), d
        x = jnp.asarray(
            rng.normal(size=(lvl.g_cap, 8)).astype(np.float32)
        )
        ref = xla_column_buffer(x, lvl)
        got = plan_apply_reference(x, plan)[: lvl.g_cap]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_fused_kernel_forward_parity():
    g = make_graph(seed=3)
    gp = with_conv_plans(g)
    rng = np.random.RandomState(2)
    for d, c, cout in ((3, 16, 8), (4, 8, 24)):
        lvl = g.level(d)
        lvlp = gp.level(d)
        x = jnp.asarray(rng.normal(size=(lvl.g_cap, c)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(N_EDGE_TYPE * c, cout)).astype(np.float32) * 0.1
        )
        ref = graph_ops.graph_conv(x, w, lvl)
        got = graph_ops.graph_conv(x, w, lvlp)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_fused_kernel_grad_parity():
    g = make_graph(seed=5, n=200)
    gp = with_conv_plans(g)
    d, c, cout = 4, 8, 16
    lvl, lvlp = g.level(d), gp.level(d)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.normal(size=(lvl.g_cap, c)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(N_EDGE_TYPE * c, cout)).astype(np.float32) * 0.1
    )
    tgt = jnp.asarray(rng.normal(size=(lvl.g_cap, cout)).astype(np.float32))

    def loss(x, w, lv):
        out = graph_ops.graph_conv(x, w, lv)
        return jnp.sum((out - tgt) ** 2)

    lr, (gxr, gwr) = jax.value_and_grad(loss, argnums=(0, 1))(x, w, lvl)
    lp, (gxp, gwp) = jax.value_and_grad(loss, argnums=(0, 1))(x, w, lvlp)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gxp), np.asarray(gxr), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gwp), np.asarray(gwr), rtol=1e-3, atol=1e-3
    )


def test_fused_kernel_node_type_concat():
    g = make_graph(seed=7, n=250)
    gp = with_conv_plans(g)
    d, c, cout = 4, 6, 8
    lvl, lvlp = g.level(d), gp.level(d)
    n_node_type = d - g.spec.full_depth + 1
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.normal(size=(lvl.g_cap, c)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(
            size=(N_EDGE_TYPE * (c + n_node_type), cout)
        ).astype(np.float32) * 0.1
    )
    ref = graph_ops.graph_conv(x, w, lvl, n_node_type)
    got = graph_ops.graph_conv(x, w, lvlp, n_node_type)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_fused_kernel_tile256_parity():
    """Larger tiles halve the descriptor count (fewer (out,src) tile
    pairs); parity must hold at tile_t=256 too."""
    g = make_graph(seed=9, n=400)
    gp = with_conv_plans(g, tile_t=256)
    rng = np.random.RandomState(11)
    d, c, cout = 4, 8, 16
    lvl, lvlp = g.level(d), gp.level(d)
    assert not bool(lvlp.conv_plan.overflow)
    x = jnp.asarray(rng.normal(size=(lvl.g_cap, c)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(N_EDGE_TYPE * c, cout)).astype(np.float32) * 0.1
    )
    ref = graph_ops.graph_conv(x, w, lvl)
    got = graph_ops.graph_conv(x, w, lvlp)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_packed_kernel_forward_parity():
    """K-packed forward kernel (one [T,KT]@[KT,C] matmul per pack) must
    match the XLA segment-sum conv."""
    from octfusion_tpu.octree.dual_graph import with_conv_plans as wcp

    g = make_graph(seed=13, n=400)
    gp = wcp(g, packed=True)
    rng = np.random.RandomState(17)
    for d, c, cout in ((3, 16, 8), (4, 8, 24)):
        lvl, lvlp = g.level(d), gp.level(d)
        assert not bool(lvlp.conv_plan.overflow), d
        x = jnp.asarray(rng.normal(size=(lvl.g_cap, c)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(N_EDGE_TYPE * c, cout)).astype(np.float32) * 0.1
        )
        ref = graph_ops.graph_conv(x, w, lvl)
        got = graph_ops.graph_conv(x, w, lvlp)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )
