"""Multi-device training steps via ``shard_map`` over a ('data', 'model')
mesh.

Design (TPU-native, per the scaling-book recipe): the batch shards over the
``data`` axis — each device builds the octree/dual graph of its *local*
samples entirely on-device, so no communication happens during graph
construction; gradients are ``pmean``-ed over ICI.  For the VAE the SDF
query points additionally shard over the ``model`` axis (each device
evaluates the MPU on a slice of the 50k supervision points — a
sequence-parallel-style split of the heaviest memory-bound part).  The
reference's equivalent is DDP allreduce
(`/root/reference/models/octfusion_model_union.py:180-196`).
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..diffusion import ema as ema_lib


def _fold_axis_keys(key):
    di = jax.lax.axis_index("data")
    mi = jax.lax.axis_index("model")
    return jax.random.fold_in(jax.random.fold_in(key, di), mi)


def make_vae_dp_train_step(solver, mesh: Mesh, total_steps: int = 100_000):
    """Data-parallel (+ query-sharded) VAE train step.

    batch['points','normals']: [B_global, N, 3] sharded over 'data';
    batch['pos','sdf','grad']: [B_global, M, ...] sharded over
    ('data', 'model') on (batch, query) axes."""
    opt = solver.make_optimizer(total_steps)

    def local_step(state, batch, key):
        key = _fold_axis_keys(key)

        def loss_fn(params):
            return solver.loss_fn(params, batch, key)

        (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(jax.lax.pmean(grads, "model"), "data")
        ld = jax.lax.pmean(jax.lax.pmean(ld, "model"), "data")
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=params, opt_state=opt_state
            ),
            ld,
        )

    batch_specs = {
        "points": P("data"),
        "normals": P("data"),
        "label": P("data"),
        "pos": P("data", "model"),
        "sdf": P("data", "model"),
        "grad": P("data", "model"),
    }

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), batch_specs, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_union_dp_train_step(solver, mesh: Mesh):
    """Data-parallel diffusion train step (lr or hr stage)."""
    tx = solver.make_optimizer()
    ema_rate = solver.cfg.diffusion.ema_rate

    def local_step(state, vae_params, batch, key):
        key = _fold_axis_keys(key)

        def loss_fn(params):
            return solver.loss_fn(params, vae_params, batch, key)

        (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(jax.lax.pmean(grads, "model"), "data")
        ld = jax.lax.pmean(jax.lax.pmean(ld, "model"), "data")
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_lib.ema_update(state.ema_params, params, ema_rate)
        return (
            state.replace(
                step=state.step + 1, params=params,
                opt_state=opt_state, ema_params=ema_params,
            ),
            ld,
        )

    def batch_specs(batch):
        keys = {"points", "normals", "label", "split_small"}
        return {k: P("data") for k in batch if k in keys}

    def sharded(state, vae_params, batch, key):
        return shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), batch_specs(batch), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(state, vae_params, batch, key)

    return jax.jit(sharded)


def make_dp_sample(solver, mesh: Mesh, steps=None, resolution: int = 256,
                   near_frac: float = 0.125, compact: bool = True):
    """Data-parallel generation: every device of the 'data' axis runs the
    full cascade (lr sample -> octree growth -> hr [-> feature] sample ->
    growing decode -> SDF grid) for its own shape — the v5e-8 throughput
    path the single-chip benchmark extrapolates to.  The per-device body is
    ``solver.dp_cascade`` (2-stage UnionSolver or 3-hop Union3TSolver).

    Returns a jitted fn(params, vae_params, keys [n_data], labels|None).
    With ``compact`` (default) it returns
    ``(ids [n, cap], vals [n, cap, 8] f16, counts [n], grids [n,R,R,R]
    f16)`` — the active-cell transfer of ``utils.sdf``: the host fetches
    the small compact arrays and marches cells directly
    (``mesh.marching_from_cells``), touching the dense grids only for
    over-cap fallbacks (they stay on device otherwise).  With
    ``compact=False`` it returns just the dense fp16 grids."""
    import jax.numpy as jnp

    from ..utils import sdf as sdf_utils

    m = solver.cfg.model
    n_steps = steps or solver.cfg.diffusion.ddim_steps

    def local(params, vae_params, key, label):
        # the caller provides one key per shape index (reference semantics:
        # sample i reproducible from seed+i alone, `train.py:166-177`,
        # `octfusion_model_union.py:372`) — do NOT fold the device index in
        out = solver.dp_cascade(
            params, vae_params, key[0],
            label=None if label is None else label[:1],
            steps=n_steps,
        )
        from ..ops import mpu as mpu_ops

        grid = mpu_ops.mpu_grid_eval(
            out["reg_voxs"][m.depth_out], out["octree_out"],
            m.full_depth, m.depth_out, resolution,
            -solver.cfg.solver.sdf_scale, solver.cfg.solver.sdf_scale,
        )
        grid = grid.reshape(1, resolution, resolution, resolution)
        if not compact:
            return grid.astype(jnp.float16)
        ids, vals, counts, _ = sdf_utils._active_cells(
            grid, 8 * resolution * resolution
        )
        return ids, vals, counts, grid.astype(jnp.float16)

    out_specs = (
        (P("data"), P("data"), P("data"), P("data")) if compact
        else P("data")
    )

    def wrapper(params, vae_params, keys, labels=None):
        if labels is None:
            fn = shard_map(
                lambda p, vp, k: local(p, vp, k, None),
                mesh=mesh, in_specs=(P(), P(), P("data")),
                out_specs=out_specs, check_vma=False,
            )
            return fn(params, vae_params, keys)
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=out_specs, check_vma=False,
        )
        return fn(params, vae_params, keys, labels)

    return jax.jit(wrapper, static_argnames=())


def shard_batch(batch, mesh: Mesh, vae: bool):
    """Place the host batch with the step's expected shardings.

    Multi-process: each process's loader is rank-striped and yields only
    its local rows, assembled into the global array via
    ``dist.global_array_from_local``."""
    from .dist import global_array_from_local

    specs = {
        "points": P("data"),
        "normals": P("data"),
        "label": P("data"),
        "split_small": P("data"),
        "pos": P("data", "model"),
        "sdf": P("data", "model"),
        "grad": P("data", "model"),
    }
    out = {}
    for k, v in batch.items():
        if k == "filename":
            continue
        if not vae and k in ("pos", "sdf", "grad"):
            continue
        out[k] = global_array_from_local(v, mesh, specs[k])
    return out
