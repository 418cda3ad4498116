"""VAE training/eval solver
(`/root/reference/models/octfusion_model_vae.py`): AdamW + poly LR decay,
geometry loss, reconstruction inference -> SDF grid -> mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..nn import losses
from ..nn.vae import GraphVAE, copy_topology_octree
from ..octree.dual_graph import build_dual_graph
from ..utils import sdf as sdf_utils
from .common import TrainState, batch_to_graph, batch_to_graph_jit, flatten_pos


class VAESolver:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        m = cfg.model
        self.use_color = cfg.loss.name == "color"
        self.vae = GraphVAE(
            depth=m.depth, channel_in=m.channel_in, full_depth=m.full_depth,
            depth_stop=m.depth_stop, depth_out=m.depth_out,
            embed_dim=m.embed_dim, resblk_num=m.resblk_num,
            channels=tuple(m.channels), use_checkpoint=m.use_checkpoint,
            remat_policy=m.remat_policy,
            color_channel=3 if self.use_color else 0,
        )
        self.spec1 = cfg.capacity.octree_spec(m.depth, m.full_depth, 1)
        self.edge_factor = cfg.capacity.edge_factor

    # ------------------------------------------------------------------
    def make_optimizer(self, total_steps: int):
        # AdamW + poly(0.9) decay (`octfusion_model_vae.py:90-95`)
        def sched(step):
            frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
            return self.cfg.train.lr * (1.0 - frac) ** 0.9

        return optax.adamw(sched, weight_decay=self.cfg.train.weight_decay)

    def init_state(self, key, batch, total_steps: int = 100_000) -> TrainState:
        feats = (
            jnp.asarray(batch["point_colors"]) if self.use_color else None
        )
        _, g = batch_to_graph_jit(
            jnp.asarray(batch["points"]), jnp.asarray(batch["normals"]),
            self.spec1, self.edge_factor, features=feats,
        )
        params = jax.jit(self.vae.init)(key, g, g, key)
        opt = self.make_optimizer(total_steps)
        return TrainState(
            step=jnp.asarray(0, jnp.int32), params=params,
            opt_state=opt.init(params),
        )

    # ------------------------------------------------------------------
    def loss_fn(self, params, batch, key):
        m = self.cfg.model
        feats = batch.get("point_colors") if self.use_color else None
        octree, g = batch_to_graph(
            batch["points"], batch["normals"], self.spec1, self.edge_factor,
            features=feats,
        )
        out = self.vae.apply(params, g, g, key)
        pos, pb = flatten_pos(batch["pos"])
        sdf_gt = batch["sdf"].reshape(-1)
        grad_gt = batch["grad"].reshape(-1, 3)
        if self.use_color:
            # color supervision at (a subset of) the input surface points
            k = min(4096, batch["points"].shape[1])
            cpos, cb = flatten_pos(batch["points"][:, :k])
            cgt = batch["point_colors"][:, :k].reshape(-1, 3)
            ld = losses.geometry_color_loss(
                out, pos, pb, sdf_gt, grad_gt, cpos, cb, cgt,
                m.full_depth, m.depth_stop, m.depth_out,
                kl_weight=self.cfg.loss.kl_weight,
                loss_type=self.cfg.loss.loss_type,
            )
        else:
            ld = losses.geometry_loss(
                out, pos, pb, sdf_gt, grad_gt,
                m.full_depth, m.depth_stop, m.depth_out,
                kl_weight=self.cfg.loss.kl_weight,
                loss_type=self.cfg.loss.loss_type,
                spatial_grad=self.cfg.loss.spatial_grad,
            )
        # capacity overflow means nodes/edges were dropped -> the step is
        # silently wrong; surface it so the train loop can fail loudly
        # (consumer of the contract at `octree/octree.py:113-116`)
        ld["overflow"] = g.any_overflow().astype(jnp.float32)
        del octree
        return ld["loss"], ld

    def make_train_step(self, total_steps: int = 100_000):
        opt = self.make_optimizer(total_steps)

        @jax.jit
        def step(state: TrainState, batch, key):
            (loss, ld), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True
            )(state.params, batch, key)
            updates, opt_state = opt.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1, params=params, opt_state=opt_state
                ),
                ld,
            )

        return step

    def _jit(self, name, fn, **kw):
        # per-solver jit cache: a fresh jax.jit closure per call would pay
        # a remote compile-cache round trip PER SHAPE over the axon tunnel
        # (measured: recon crawled at minutes/shape; UnionSolver has the
        # same pattern for its sampling path)
        if not hasattr(self, "_jit_store"):
            self._jit_store = {}
        if name not in self._jit_store:
            self._jit_store[name] = jax.jit(fn, **kw)
        return self._jit_store[name]

    # ------------------------------------------------------------------
    def reconstruct(self, params, batch, key, resolution: Optional[int] = None,
                    save_paths=None, fast_mesh: bool = False):
        """Encode + growing decode + SDF grid (+ optional mesh export)
        (`octfusion_model_vae.py:189-205`)."""
        m = self.cfg.model
        feats = (
            jnp.asarray(batch["point_colors"])
            if self.use_color and "point_colors" in batch else None
        )
        octree, g = batch_to_graph_jit(
            jnp.asarray(batch["points"]), jnp.asarray(batch["normals"]),
            self.spec1, self.edge_factor, features=feats,
        )
        mean, _ = self._jit(
            "encode",
            lambda p, g: self.vae.apply(p, g, method=GraphVAE.encode),
        )(params, g)

        def small_graph(o):
            o_small = copy_topology_octree(o, m.depth_stop)
            return build_dual_graph(
                o_small, self.edge_factor, up_to=m.depth_stop
            )

        g_small = self._jit("small_graph", small_graph)(octree)
        out = self._jit(
            "decode_grow",
            lambda p, c, g: self.vae.apply(p, c, g,
                                           method=GraphVAE.decode_grow),
        )(params, mean, g_small)
        res = resolution or self.cfg.solver.resolution
        if save_paths is not None and fast_mesh:
            # compact-cell path: no dense host grid, marching on active cells
            sdf_utils.export_meshes_compact(
                out["reg_voxs"][m.depth_out], out["octree_out"],
                m.full_depth, m.depth_out, save_paths, size=res,
                bbmin=-self.cfg.solver.sdf_scale,
                bbmax=self.cfg.solver.sdf_scale,
                mesh_scale=self.cfg.data_test.point_scale,
            )
            return None, out
        sdfs = sdf_utils.calc_sdf(
            out["reg_voxs"][m.depth_out], out["octree_out"],
            m.full_depth, m.depth_out,
            batch_size=octree.batch_size, size=res,
            bbmin=-self.cfg.solver.sdf_scale, bbmax=self.cfg.solver.sdf_scale,
        )
        if save_paths is not None:
            sdf_utils.export_meshes(
                sdfs, save_paths,
                bbmin=-self.cfg.solver.sdf_scale,
                bbmax=self.cfg.solver.sdf_scale,
                mesh_scale=self.cfg.data_test.point_scale,
            )
        return sdfs, out
