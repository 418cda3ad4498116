"""Diffusion stack tests: schedules, split codecs, U-Nets, sampler."""

import numpy as np
import jax
import jax.numpy as jnp

from octfusion_tpu.diffusion import sampler, schedule
from octfusion_tpu.nn.unet_union import UNetUnion, UnionConfig
from octfusion_tpu.octree import split_codec
from octfusion_tpu.octree.octree import OctreeSpec, build_octree, merge_octrees
from octfusion_tpu.octree.dual_graph import build_dual_graph


def test_schedule_math():
    t = np.linspace(0.01, 0.99, 17).astype(np.float32)
    snr = np.asarray(schedule.beta_linear_log_snr(jnp.asarray(t)))
    ref = -np.log(np.expm1(1e-4 + 10 * t**2))
    np.testing.assert_allclose(snr, ref, rtol=1e-5)
    a, s = schedule.log_snr_to_alpha_sigma(jnp.asarray(snr))
    np.testing.assert_allclose(
        np.asarray(a) ** 2 + np.asarray(s) ** 2, 1.0, atol=1e-6
    )
    cos = np.asarray(schedule.alpha_cosine_log_snr(jnp.asarray(t)))
    ref_cos = -np.log(np.clip(np.cos((t + 0.008) / 1.008 * np.pi / 2) ** -2 - 1, 1e-5, None))
    np.testing.assert_allclose(cos, ref_cos, rtol=1e-4)


def make_octree(seed=0, depth=4, full_depth=2, n=250, batch=2):
    rng = np.random.RandomState(seed)
    octs = []
    for _ in range(batch):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        spec = OctreeSpec.create(
            depth, full_depth, 1, finest_cap_per_sample=4096, decay=1.0
        )
        octs.append(
            build_octree(
                jnp.asarray((0.6 * v).astype(np.float32)),
                jnp.asarray(v.astype(np.float32)),
                spec,
            )
        )
    return merge_octrees(octs) if batch > 1 else octs[0]


def test_split_small_roundtrip():
    o = make_octree()
    split = split_codec.octree2split_small(o)
    assert split.shape == (2, 4, 4, 4, 8)
    assert set(np.unique(np.asarray(split))) <= {-1.0, 1.0}
    o2 = split_codec.split2octree_small(split, o.spec)
    fd = o.spec.full_depth
    for d in range(fd + 3):
        assert int(o2.nnum[d]) == int(o.nnum[d]), d
        nn = int(o.nnum[d])
        np.testing.assert_array_equal(
            np.asarray(o2.keys[d][:nn]), np.asarray(o.keys[d][:nn])
        )
        if d < fd + 2:
            np.testing.assert_array_equal(
                np.asarray(o2.child[d][:nn]), np.asarray(o.child[d][:nn])
            )


def test_split_large_roundtrip():
    o = make_octree(depth=5, full_depth=2, seed=1)
    sd = 3
    split = split_codec.octree2split_large(o, sd)
    # rebuild levels sd+1, sd+2 on a topology copy truncated at sd
    from octfusion_tpu.nn.vae import copy_topology_octree

    base = copy_topology_octree(o, sd)
    o2 = split_codec.split2octree_large(base, split, sd)
    for d in range(sd + 3):
        assert int(o2.nnum[d]) == int(o.nnum[d]), d
        nn = int(o.nnum[d])
        np.testing.assert_array_equal(
            np.asarray(o2.keys[d][:nn]), np.asarray(o.keys[d][:nn])
        )


def tiny_union(num_classes=None):
    return UnionConfig(
        unet_type=("lr", "hr"),
        df_type=("x0", "eps"),
        input_depth=(2, 4),
        full_depth=2,
        input_channels=(8, 3),
        out_channels=(8, 3),
        model_channels=(8, 16),
        num_res_blocks=((1, 1, 1), (1, 1, 0)),
        channel_mult=((1, 2), (1, 1, 1)),
        attention_resolutions=(2,),
        num_heads=2,
        num_classes=num_classes,
        use_checkpoint=False,
    )


def test_unet_lr_forward():
    cfg = tiny_union(num_classes=5)
    model = UNetUnion(cfg, stage_flag="lr")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 4, 4, 8))
    t = jnp.array([0.3, -1.2])
    lab = jnp.array([1, 3])
    params = model.init(key, "lr", x, t, label=lab)
    y = model.apply(params, "lr", x, t, label=lab)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_unet_hr_with_lr_middle():
    o = make_octree()
    g = build_dual_graph(o)
    cfg = tiny_union()
    model = UNetUnion(cfg, stage_flag="hr")
    key = jax.random.PRNGKey(1)
    lvl = g.level(4)
    x = jax.random.normal(key, (lvl.g_cap, 3))
    x = jnp.where(lvl.node_mask[:, None], x, 0)
    t = jnp.array([0.5, 0.1])
    params = model.init(key, "hr", x, t, g=g)
    y = jax.jit(
        lambda p, x, t: model.apply(p, "hr", x, t, g=g)
    )(params, x, t)
    assert y.shape == (lvl.g_cap, 3)
    # zero-init output conv -> exactly zero at init
    assert float(jnp.abs(y).max()) == 0.0


def test_sample_loops():
    o = make_octree()
    g = build_dual_graph(o)
    cfg = tiny_union()
    model = UNetUnion(cfg, stage_flag="hr")
    key = jax.random.PRNGKey(2)
    lvl = g.level(4)
    xg = jnp.zeros((lvl.g_cap, 3))
    t2 = jnp.zeros((2,))
    xlr = jnp.zeros((2, 4, 4, 4, 8))
    params = model.init(key, xlr, xg, g, t2, method=UNetUnion.warmup)

    # lr stage: x0 parameterisation with truncation + sign snap
    def lr_fn(x, tb, x_start):
        return model.apply(params, "lr", x, tb, x_self_cond=x_start)

    out = jax.jit(
        lambda k: sampler.sample_loop(
            lr_fn, k, (2, 4, 4, 4, 8), 2, steps=8,
            log_snr_fn=schedule.beta_linear_log_snr,
            df_type="x0", truncated_index=0.7, snap_sign=True,
        )
    )(key)
    assert out.shape == (2, 4, 4, 4, 8)
    assert bool(jnp.isfinite(out).all())

    # hr stage: eps parameterisation on the graph
    def hr_fn(x, tb, x_start):
        return model.apply(params, "hr", x, tb, g=g)

    out2 = jax.jit(
        lambda k: sampler.sample_loop(
            hr_fn, k, (lvl.g_cap, 3), 2, steps=4,
            log_snr_fn=schedule.beta_linear_log_snr, df_type="eps",
        )
    )(key)
    assert out2.shape == (lvl.g_cap, 3)
    assert bool(jnp.isfinite(out2).all())


def test_diffusion_loss_grads():
    o = make_octree()
    g = build_dual_graph(o)
    cfg = tiny_union()
    model = UNetUnion(cfg, stage_flag="hr")
    key = jax.random.PRNGKey(3)
    lvl = g.level(4)
    code = jax.random.normal(key, (lvl.g_cap, 3))
    code = jnp.where(lvl.node_mask[:, None], code, 0)
    params = model.init(key, "hr", code, jnp.zeros((2,)), g=g)

    def loss_fn(p):
        return sampler.diffusion_loss(
            lambda noised, snr: model.apply(p, "hr", noised, snr, g=g),
            key, code, lvl.node_batch, 2,
            schedule.beta_linear_log_snr, "eps", mask=lvl.node_mask,
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_conditional_hr_label_changes_output():
    """Class conditioning must reach both U-Nets (label embedding added to
    the time embedding, `graph_unet_hr.py:232-234`)."""
    o = make_octree()
    g = build_dual_graph(o)
    cfg = tiny_union(num_classes=5)
    model = UNetUnion(cfg, stage_flag="hr")
    key = jax.random.PRNGKey(7)
    lvl = g.level(4)
    x = jax.random.normal(key, (lvl.g_cap, 3))
    x = jnp.where(lvl.node_mask[:, None], x, 0)
    t = jnp.array([0.5, 0.1])
    xlr = jax.random.normal(key, (2, 4, 4, 4, 8))
    lab0 = jnp.array([0, 1])
    lab1 = jnp.array([3, 4])
    params = model.init(key, xlr, x, g, t, label=lab0, method=UNetUnion.warmup)
    # at init every diffusion res-block's second conv is zero-init (the
    # standard zero_module pattern), which blocks all embedding influence;
    # un-zero them plus the hr output conv so label effects reach the output
    k2 = jax.random.split(key, 8)
    hr_tree = params["params"]["unet_hr"]
    hr_tree["out"]["weights"] = jnp.ones_like(hr_tree["out"]["weights"]) * 0.01
    hr_tree["input_0"]["conv2"]["weights"] = (
        jax.random.normal(k2[0], hr_tree["input_0"]["conv2"]["weights"].shape)
        * 0.02
    )
    lr_tree = params["params"]["unet_lr"]
    w = lr_tree["down_0_res"]["conv2"]["conv"]["kernel"]
    lr_tree["down_0_res"]["conv2"]["conv"]["kernel"] = (
        jax.random.normal(k2[1], w.shape) * 0.02
    )

    y0 = model.apply(params, "hr", x, t, g=g, label=lab0)
    y1 = model.apply(params, "hr", x, t, g=g, label=lab1)
    assert float(jnp.abs(y0 - y1).max()) > 0

    z0 = model.apply(params, "lr", xlr, t, label=lab0)
    z1 = model.apply(params, "lr", xlr, t, label=lab1)
    assert float(jnp.abs(z0 - z1).max()) > 0
