"""MPU oracle tests + GraphVAE end-to-end forward/backward/growth."""

import numpy as np
import jax
import jax.numpy as jnp

from octfusion_tpu.octree.octree import OctreeSpec, build_octree, merge_octrees
from octfusion_tpu.octree.dual_graph import build_dual_graph
from octfusion_tpu.ops import mpu as mpu_ops
from octfusion_tpu.nn import losses
from octfusion_tpu.nn.vae import GraphVAE, copy_topology_octree


def make_octree(seed=0, depth=4, full_depth=2, n=250, batch=1):
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


def brute_mpu(pos, pb, reg_levels, o, fd, d_end):
    from octfusion_tpu.octree import morton as M

    corners_off = np.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
         [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], np.float64
    )
    n = pos.shape[0]
    num = np.zeros(n)
    den = np.zeros(n)
    covered = np.zeros(n, bool)
    for dd in range(fd, d_end + 1):
        scale = 2**dd
        keys = np.asarray(o.keys[dd])
        bts = np.asarray(o.batch[dd])
        child = np.asarray(o.child[dd])
        nn = int(o.nnum[dd])
        lookup = {
            (int(bts[i]), int(keys[i])): i for i in range(nn)
        }
        reg = np.asarray(reg_levels[dd])
        for p in range(n):
            xyzf = (pos[p] + 1.0) * scale / 2.0 - 0.5
            xyzi = np.floor(xyzf)
            any_valid = False
            for c in range(8):
                corner = xyzi + corners_off[c]
                if not ((corner > -1).all() and (corner < scale).all()):
                    continue
                k = int(
                    np.asarray(
                        M.xyz2key(
                            jnp.asarray([int(corner[0])]),
                            jnp.asarray([int(corner[1])]),
                            jnp.asarray([int(corner[2])]),
                            dd,
                        )
                    )[0]
                )
                slot = lookup.get((int(pb[p]), k))
                if slot is None:
                    continue
                if dd < d_end and child[slot] >= 0:
                    continue
                if dd == d_end:
                    any_valid = True
                cf = xyzf - corner
                w = np.prod(1.0 - np.abs(cf)) * (dd**2 / 50.0)
                cf2 = cf * (2.0 / scale)
                fval = np.dot(reg[slot, :3], cf2) + reg[slot, 3]
                num[p] += w * fval
                den[p] += w
            covered[p] |= any_valid
    return num / (den + 1e-8), covered


def test_mpu_matches_bruteforce():
    o = make_octree(seed=0, batch=2)
    fd, depth = o.spec.full_depth, o.spec.depth
    rng = np.random.RandomState(1)
    reg = {
        dd: rng.normal(size=(o.spec.node_caps[dd], 4)).astype(np.float32)
        for dd in range(fd, depth + 1)
    }
    # zero out padded rows like the decoder does
    for dd in reg:
        reg[dd][int(o.nnum[dd]):] = 0
    pos = rng.uniform(-0.99, 0.99, size=(64, 3)).astype(np.float32)
    pb = rng.randint(0, 2, size=(64,)).astype(np.int32)
    got_sdf, got_cov = mpu_ops.mpu_eval(
        jnp.asarray(pos), jnp.asarray(pb),
        {k: jnp.asarray(v) for k, v in reg.items()}, o, fd, depth,
    )
    ref_sdf, ref_cov = brute_mpu(pos.astype(np.float64), pb, reg, o, fd, depth)
    np.testing.assert_allclose(np.asarray(got_sdf), ref_sdf, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_cov), ref_cov)


def test_mpu_grad_matches_fd():
    """Forward-mode spatial gradient vs numeric finite differences."""
    o = make_octree(seed=2)
    fd, depth = o.spec.full_depth, o.spec.depth
    rng = np.random.RandomState(3)
    reg = {
        dd: jnp.asarray(
            rng.normal(size=(o.spec.node_caps[dd], 4)).astype(np.float32)
        )
        for dd in range(fd, depth + 1)
    }
    pos = rng.uniform(-0.6, 0.6, size=(16, 3)).astype(np.float32)
    pb = np.zeros(16, np.int32)
    sdf, grad = losses.mpu_with_grad(
        jnp.asarray(pos), jnp.asarray(pb), reg, o, fd, depth
    )
    eps = 1e-3
    for axis in range(3):
        pp = pos.copy(); pp[:, axis] += eps
        pm = pos.copy(); pm[:, axis] -= eps
        sp = np.asarray(mpu_ops.mpu_eval(jnp.asarray(pp), jnp.asarray(pb), reg, o, fd, depth)[0])
        sm = np.asarray(mpu_ops.mpu_eval(jnp.asarray(pm), jnp.asarray(pb), reg, o, fd, depth)[0])
        fdg = (sp - sm) / (2 * eps)
        # exclude points whose neighbourhood cell changed between +/- eps
        ok = np.abs(fdg - np.asarray(grad[:, axis])) < 5e-2
        assert ok.mean() > 0.8, f"axis {axis}: {ok.mean()}"


def test_mpu_eval_grad_matches_jvp_path():
    """The one-pass analytic (sdf, dsdf/dpos) of ``mpu_eval_grad`` must
    equal mpu_eval + the 3-JVP ``losses.mpu_with_grad`` — both forward
    values and the reverse-mode gradients w.r.t. the planes (what the VAE
    training step differentiates)."""
    o = make_octree(seed=7, batch=2)
    fd, depth = o.spec.full_depth, o.spec.depth
    rng = np.random.RandomState(8)
    reg = {
        dd: jnp.asarray(
            rng.normal(size=(o.spec.node_caps[dd], 4)).astype(np.float32)
        )
        for dd in range(fd, depth + 1)
    }
    pos = jnp.asarray(
        rng.uniform(-0.99, 0.99, size=(96, 3)).astype(np.float32)
    )
    pb = jnp.asarray(rng.randint(0, 2, size=(96,)).astype(np.int32))

    sdf_a, grad_a = mpu_ops.mpu_eval_grad(pos, pb, reg, o, fd, depth)
    sdf_e, _ = mpu_ops.mpu_eval(pos, pb, reg, o, fd, depth)
    sdf_j, grad_j = losses.mpu_with_grad(pos, pb, reg, o, fd, depth)
    np.testing.assert_allclose(np.asarray(sdf_a), np.asarray(sdf_e),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sdf_a), np.asarray(sdf_j),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_a), np.asarray(grad_j),
                               rtol=1e-4, atol=1e-4)

    def make_scalar(path):
        def f(r):
            if path == "analytic":
                s, g2 = mpu_ops.mpu_eval_grad(pos, pb, r, o, fd, depth)
            else:
                s, g2 = losses.mpu_with_grad(pos, pb, r, o, fd, depth)
            return jnp.sum(s ** 2) + jnp.sum(g2 ** 2)

        return jax.grad(f)(reg)

    ga, gj = make_scalar("analytic"), make_scalar("jvp")
    for dd in ga:
        np.testing.assert_allclose(np.asarray(ga[dd]), np.asarray(gj[dd]),
                                   rtol=1e-4, atol=1e-4)


def test_geometry_loss_analytic_matches_jvp():
    """geometry_loss(spatial_grad='analytic') must reproduce the 'jvp'
    formulation: identical loss dict and identical parameter gradients."""
    o = make_octree(seed=9, batch=2, n=150)
    g = build_dual_graph(o)
    vae = tiny_vae(o)
    key = jax.random.PRNGKey(2)
    params = vae.init(key, g, g, key)

    rng = np.random.RandomState(10)
    pos = jnp.asarray(rng.uniform(-0.8, 0.8, size=(64, 3)).astype(np.float32))
    pb = jnp.asarray(rng.randint(0, 2, size=(64,)).astype(np.int32))
    sdf_gt = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    grad_gt = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))

    def loss_fn(p, mode):
        out = vae.apply(p, g, g, key)
        ld = losses.geometry_loss(
            out, pos, pb, sdf_gt, grad_gt,
            o.spec.full_depth, 3, o.spec.depth, kl_weight=0.1,
            spatial_grad=mode,
        )
        return ld["loss"], ld

    (la, lda), grads_a = jax.value_and_grad(
        loss_fn, has_aux=True)(params, "analytic")
    (lj, ldj), grads_j = jax.value_and_grad(
        loss_fn, has_aux=True)(params, "jvp")
    np.testing.assert_allclose(float(la), float(lj), rtol=1e-5)
    for k in ldj:
        np.testing.assert_allclose(float(lda[k]), float(ldj[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    fa = jax.tree_util.tree_leaves(grads_a)
    fj = jax.tree_util.tree_leaves(grads_j)
    for xa, xj in zip(fa, fj):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xj),
                                   rtol=1e-3, atol=1e-5)


def tiny_vae(o):
    return GraphVAE(
        depth=o.spec.depth, full_depth=o.spec.full_depth,
        depth_stop=3, depth_out=o.spec.depth,
        embed_dim=2, resblk_num=2,
        channels=(4, 8, 8, 8, 8),
        use_checkpoint=False,
    )


def test_vae_forward_loss_grad():
    o = make_octree(seed=4, batch=2, n=150)
    g = build_dual_graph(o)
    vae = tiny_vae(o)
    key = jax.random.PRNGKey(0)
    params = vae.init(key, g, g, key)

    rng = np.random.RandomState(5)
    pos = jnp.asarray(rng.uniform(-0.8, 0.8, size=(64, 3)).astype(np.float32))
    pb = jnp.asarray(rng.randint(0, 2, size=(64,)).astype(np.int32))
    sdf_gt = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    grad_gt = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))

    def loss_fn(p):
        out = vae.apply(p, g, g, key)
        ld = losses.geometry_loss(
            out, pos, pb, sdf_gt, grad_gt,
            o.spec.full_depth, 3, o.spec.depth, kl_weight=0.1,
        )
        return ld["loss"], ld

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(x).all()) for x in flat)
    # at least some grads nonzero
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)
    for k in ld:
        assert np.isfinite(float(ld[k])), k


def test_vae_decode_grow():
    """Growing decode runs under jit and produces a valid octree whose
    topology matches its own predicted splits."""
    o = make_octree(seed=6, n=150)
    g = build_dual_graph(o)
    vae = tiny_vae(o)
    key = jax.random.PRNGKey(1)
    params = vae.init(key, g, g, key)

    # encode, then decode with growth from the copied topology
    octree_small = copy_topology_octree(o, 3)
    g_small = build_dual_graph(octree_small, up_to=3)

    def run(p):
        mean, logvar = vae.apply(p, g, method=GraphVAE.encode)
        out = vae.apply(p, mean, g_small, method=GraphVAE.decode_grow)
        return out

    out = jax.jit(run)(params)
    oc = out["octree_out"]
    for d in range(3, o.spec.depth):
        label = np.asarray(jnp.argmax(out["logits"][d], -1))
        nmask = np.asarray(oc.node_mask(d))
        ne = np.asarray(oc.nempty_mask(d))
        np.testing.assert_array_equal(ne[nmask], (label > 0)[nmask])
        assert int(oc.nnum[d + 1]) == 8 * int(oc.nnum_nempty[d])


def test_sdf_grid_hierarchical_matches_dense():
    """Hierarchical coarse-to-fine grid must agree with the dense pass near
    the surface (exactly where iso-surfacing reads it)."""
    import jax.numpy as jnp

    from octfusion_tpu.utils import sdf as sdf_utils

    o = make_octree(seed=9, n=200)
    fd, depth = o.spec.full_depth, o.spec.depth
    # per-node planes of the analytic sphere SDF F(p) = |p| - 0.6:
    # n = c/|c|, b = F(c) at each node centre -> the MPU blend approximates
    # a genuinely smooth field (what a trained decoder produces)
    reg = {}
    for dd in range(fd, depth + 1):
        from octfusion_tpu.octree import morton as M

        keys = np.asarray(o.keys[dd])
        scale = 2**dd
        x, y, z = (np.asarray(v) for v in M.key2xyz(jnp.asarray(keys), dd))
        centre = (np.stack([x, y, z], -1) + 0.5) / scale * 2.0 - 1.0
        norm = np.linalg.norm(centre, axis=-1, keepdims=True)
        r = np.zeros((o.spec.node_caps[dd], 4), np.float32)
        r[:, :3] = centre / np.maximum(norm, 1e-9)
        r[:, 3] = (norm[:, 0] - 0.6)
        r[~np.asarray(o.node_mask(dd))] = 0
        reg[dd] = jnp.asarray(r)
    size = 64
    dense = sdf_utils.calc_sdf(
        reg, o, fd, depth, 1, size=size, max_batch=32**3, mode="gather",
        hierarchical=False,
    )
    hier = sdf_utils.calc_sdf(
        reg, o, fd, depth, 1, size=size, max_batch=32**3, mode="gather",
        hierarchical=True, near_frac=0.25,
    )
    near = np.abs(dense) < 0.04
    assert near.sum() > 100
    np.testing.assert_allclose(hier[near], dense[near], atol=2e-3)


def test_mpu_grid_eval_matches_gather_path():
    """The dense-resampling grid evaluator must agree with the per-query
    gather path (mpu_eval) — same corners, weights, and boundary handling."""
    o = make_octree(seed=11, n=220, batch=2)
    fd, depth = o.spec.full_depth, o.spec.depth
    rng = np.random.RandomState(3)
    reg = {
        dd: jnp.asarray(
            rng.normal(size=(o.spec.node_caps[dd], 4)).astype(np.float32)
        )
        for dd in range(fd, depth + 1)
    }
    size, bbmin, bbmax = 17, -0.93, 0.91  # odd size, asymmetric box
    grid = mpu_ops.mpu_grid_eval(reg, o, fd, depth, size, bbmin, bbmax)
    assert grid.shape == (2, size, size, size)

    # gather-path oracle on the same grid points
    coord = np.arange(size, dtype=np.float32) * ((bbmax - bbmin) / size) + bbmin
    g = np.stack(np.meshgrid(coord, coord, coord, indexing="ij"), -1)
    pos = jnp.asarray(g.reshape(-1, 3))
    for b in range(2):
        pb = jnp.full((pos.shape[0],), b, jnp.int32)
        ref, _ = mpu_ops.mpu_eval(pos, pb, reg, o, fd, depth)
        np.testing.assert_allclose(
            np.asarray(grid[b]).reshape(-1), np.asarray(ref),
            rtol=1e-4, atol=1e-5,
        )


def test_calc_sdf_compact_matches_dense_marching():
    """Compact active-cell transfer must reproduce the dense grid exactly at
    every corner of every iso-crossing cell and sign-correctly elsewhere."""
    from octfusion_tpu.utils import sdf as sdf_utils

    o = make_octree(seed=13, n=200)
    fd, depth = o.spec.full_depth, o.spec.depth
    # smooth sphere-plane field (same construction as the hierarchical test)
    reg = {}
    for dd in range(fd, depth + 1):
        from octfusion_tpu.octree import morton as M

        keys = np.asarray(o.keys[dd])
        scale = 2**dd
        x, y, z = (np.asarray(v) for v in M.key2xyz(jnp.asarray(keys), dd))
        centre = (np.stack([x, y, z], -1) + 0.5) / scale * 2.0 - 1.0
        norm = np.linalg.norm(centre, axis=-1, keepdims=True)
        r = np.zeros((o.spec.node_caps[dd], 4), np.float32)
        r[:, :3] = centre / np.maximum(norm, 1e-9)
        r[:, 3] = norm[:, 0] - 0.6
        r[~np.asarray(o.node_mask(dd))] = 0
        reg[dd] = jnp.asarray(r)
    size = 32
    dense = sdf_utils.calc_sdf(reg, o, fd, depth, 1, size=size)
    comp = sdf_utils.calc_sdf_compact(reg, o, fd, depth, 1, size=size)
    assert comp.shape == dense.shape
    # signs agree away from the zero set (the two separately-compiled
    # programs differ by fp reassociation ~1e-5)
    clear = np.abs(dense) > 1e-3
    np.testing.assert_array_equal((comp < 0)[clear], (dense < 0)[clear])
    # values agree exactly on corners of active cells
    g = dense[0]
    st = np.stack([
        g[dx:size - 1 + dx, dy:size - 1 + dy, dz:size - 1 + dz]
        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
    ], -1)
    act = (st.min(-1) <= 0) & (st.max(-1) >= 0)
    assert act.sum() > 50
    xs, ys, zs = np.nonzero(act)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                np.testing.assert_allclose(
                    comp[0][xs + dx, ys + dy, zs + dz],
                    dense[0][xs + dx, ys + dy, zs + dz], atol=1e-3,
                )
    # tiny cap -> overflow fallback returns the dense grid
    fb = sdf_utils.calc_sdf_compact(
        reg, o, fd, depth, 1, size=size, cell_cap=8
    )
    np.testing.assert_allclose(fb, dense, atol=1e-3)


def test_extract_meshes_compact_matches_grid_marching():
    """Cell-level marching on the compact transfer must produce the same
    welded mesh as dense grid + marching_tetrahedra."""
    from octfusion_tpu.utils import mesh as mesh_utils
    from octfusion_tpu.utils import sdf as sdf_utils

    o = make_octree(seed=21, n=200)
    fd, depth = o.spec.full_depth, o.spec.depth
    reg = {}
    for dd in range(fd, depth + 1):
        from octfusion_tpu.octree import morton as M

        keys = np.asarray(o.keys[dd])
        scale = 2**dd
        x, y, z = (np.asarray(v) for v in M.key2xyz(jnp.asarray(keys), dd))
        centre = (np.stack([x, y, z], -1) + 0.5) / scale * 2.0 - 1.0
        norm = np.linalg.norm(centre, axis=-1, keepdims=True)
        r = np.zeros((o.spec.node_caps[dd], 4), np.float32)
        r[:, :3] = centre / np.maximum(norm, 1e-9)
        r[:, 3] = norm[:, 0] - 0.6
        r[~np.asarray(o.node_mask(dd))] = 0
        reg[dd] = jnp.asarray(r)
    size = 32
    dense = sdf_utils.calc_sdf(reg, o, fd, depth, 1, size=size)
    v_ref, f_ref = mesh_utils.marching_tetrahedra(dense[0], 0.0)
    meshes = sdf_utils.extract_meshes_compact(reg, o, fd, depth, 1, size=size)
    v, f = meshes[0]
    assert len(v) == len(v_ref) and len(f) == len(f_ref)
    k1 = np.lexsort(v_ref.T)
    k2 = np.lexsort(v.T)
    np.testing.assert_allclose(v[k2], v_ref[k1], atol=1e-3)
    # overflow fallback path still yields a mesh
    fb = sdf_utils.extract_meshes_compact(
        reg, o, fd, depth, 1, size=size, cell_cap=8
    )
    assert len(fb[0][0]) == len(v_ref)
