"""Three-stage ("union_3t") diffusion solver
(`/root/reference/models/octfusion_model_union_3t.py`): adds a middle stage
that diffuses per-node 8-bit split vectors on the depth-6 graph, so the VAE
latents (feature stage) live at depth ``depth_stop`` (8 for Objaverse) and
decode to depth 10.

Stage layout (`configs/octfusion_obja_uncond.yaml`):
  lr      — dense split grid at full_depth (16^3 x 8);
  hr      — split_large vectors on the depth-6 graph (lr U-Net as middle);
  feature — VAE codes on the depth-``depth_stop`` graph (hr U-Net as middle).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..diffusion import sampler
from ..nn.unet_union import UNetUnion
from ..nn.vae import GraphVAE
from ..octree import split_codec
from ..octree.dual_graph import build_dual_graph, with_conv_plans
from ..utils import sdf as sdf_utils
from .common import batch_to_graph, batch_to_graph_jit
from .union_solver import UnionSolver, use_fused_conv


class Union3TSolver(UnionSolver):
    def __init__(self, cfg: Config, stage_flag: str = "feature"):
        super().__init__(cfg, stage_flag)
        d = cfg.diffusion
        assert tuple(d.unet_type)[:3] == ("lr", "hr", "feature")
        self.hr_depth = d.input_depth[1]          # 6
        self.code_depth = d.input_depth[2]        # == model.depth_stop
        assert self.code_depth == cfg.model.depth_stop

    # ------------------------------------------------------------------
    def init_params(self, key, batch):
        b = batch["points"].shape[0]
        fd = self.cfg.model.full_depth
        s = 2**fd
        lr_x = jnp.zeros((b, s, s, s, 8))
        t = jnp.zeros((b,))
        label = (
            jnp.zeros((b,), jnp.int32)
            if self.union_cfg.num_classes is not None else None
        )
        hr_x = feat_x = None
        g6 = g8 = None
        if self.stage_flag in ("hr", "feature"):
            _, g6 = batch_to_graph_jit(
                jnp.asarray(batch["points"]), jnp.asarray(batch["normals"]),
                self.spec1, self.edge_factor, up_to=self.hr_depth,
            )
            hr_x = jnp.zeros((g6.level(self.hr_depth).g_cap, 8))
        if self.stage_flag == "feature":
            _, g8 = batch_to_graph_jit(
                jnp.asarray(batch["points"]), jnp.asarray(batch["normals"]),
                self.spec1, self.edge_factor, up_to=self.code_depth,
            )
            feat_x = jnp.zeros(
                (g8.level(self.code_depth).g_cap, self.cfg.model.embed_dim)
            )
        from functools import partial

        return jax.jit(
            partial(self.df.init, method=UNetUnion.warmup)
        )(key, lr_x, hr_x, g6, t, label=label, feature_x=feat_x,
          g_feature=g8)

    def make_optimizer(self):
        import optax

        def sched(step):
            return self.cfg.train.lr * 0.9 ** (step // 1000)

        tx = optax.adamw(sched, weight_decay=self.cfg.train.weight_decay)
        frozen = {
            "lr": (),
            "hr": ("unet_lr",),
            "feature": ("unet_lr", "unet_hr"),
        }[self.stage_flag]
        if frozen:
            def label_fn(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "frozen"
                    if any(getattr(p, "key", None) in frozen for p in path)
                    else "train",
                    params,
                )

            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()}, label_fn
            )
        return tx

    # ------------------------------------------------------------------
    def loss_fn(self, params, vae_params, batch, key):
        label = (
            batch.get("label")
            if self.union_cfg.num_classes is not None else None
        )
        b = batch["points"].shape[0]
        if self.stage_flag == "lr":
            return super().loss_fn(params, vae_params, batch, key)
        if self.stage_flag == "hr":
            # split_large on the depth-6 graph layout; coarser-leaf rows are
            # zero targets (`octfusion_model_union_3t.py:133-143`)
            octree, g = batch_to_graph(
                batch["points"], batch["normals"], self.spec1,
                self.edge_factor, up_to=self.hr_depth,
            )
            split = split_codec.octree2split_large(octree, self.hr_depth)
            lvl = g.level(self.hr_depth)
            pad = jnp.zeros((g.spec.cur_off(self.hr_depth), 8), jnp.float32)
            x = jnp.concatenate([pad, split], axis=0)
            loss = sampler.diffusion_loss(
                lambda noised, snr: self.df.apply(
                    params, "hr", noised, snr, g=g, label=label
                ),
                key, x, lvl.node_batch, b, self.log_snr,
                self.df_type["hr"], mask=lvl.node_mask,
            )
            return loss, {"loss": loss,
                          "overflow": g.any_overflow().astype(jnp.float32)}
        # feature stage: VAE codes on the depth-code_depth graph with the
        # frozen hr U-Net as middle (`octfusion_model_union_3t.py:144-148`)
        octree, g = batch_to_graph(
            batch["points"], batch["normals"], self.spec1, self.edge_factor,
        )
        ekey, dkey = jax.random.split(key)
        code = jax.lax.stop_gradient(
            self.vae.apply(vae_params, g, ekey, method=GraphVAE.extract_code)
        )
        lvl = g.level(self.code_depth)
        loss = sampler.diffusion_loss(
            lambda noised, snr: self.df.apply(
                params, "feature", noised, snr, g=g, label=label
            ),
            dkey, code, lvl.node_batch, b, self.log_snr,
            self.df_type["feature"], mask=lvl.node_mask,
        )
        return loss, {"loss": loss,
                      "overflow": g.any_overflow().astype(jnp.float32)}

    # ------------------------------------------------------------------
    def sample_stage(self, params, key, g, label, depth, channels, unet_type,
                     batch_size, steps=None):
        lvl = g.level(depth)
        dcfg = self.cfg.diffusion

        def denoise(x, tb, x_start):
            return self.df.apply(params, unet_type, x, tb, g=g, label=label)

        out = sampler.sample_loop(
            denoise, key, (lvl.g_cap, channels), batch_size,
            steps or dcfg.ddim_steps, self.log_snr,
            df_type=self.df_type[unet_type], solver=dcfg.sampler,
        )
        return jnp.where(lvl.node_mask[:, None], out, 0.0)

    def dp_cascade(self, params, vae_params, key, label=None,
                   steps: Optional[int] = None):
        """Three-hop per-device cascade for the shard_map DP-generation
        path (`octfusion_model_union_3t.py:152-214` under one trace)."""
        k1, k2, k3 = jax.random.split(key, 3)
        split_small = self.sample_lr(params, k1, batch_size=1, label=label,
                                     steps=steps)
        o = split_codec.split2octree_small(split_small, self.spec1)
        g6 = build_dual_graph(o, self.edge_factor, up_to=self.hr_depth)
        if use_fused_conv():
            g6 = with_conv_plans(g6)
        split_large = self.sample_stage(
            params, k2, g6, label, self.hr_depth, 8, "hr", 1, steps
        )
        cur = split_large[g6.spec.cur_off(self.hr_depth):]
        o2 = split_codec.split2octree_large(o, cur, self.hr_depth)
        g8 = build_dual_graph(o2, self.edge_factor, up_to=self.code_depth)
        if use_fused_conv():
            g8 = with_conv_plans(g8)
        code = self.sample_stage(
            params, k3, g8, label, self.code_depth,
            self.cfg.model.embed_dim, "feature", 1, steps,
        )
        return self.vae.apply(vae_params, code, g8,
                              method=GraphVAE.decode_grow)

    def sample(self, params, vae_params, key, batch_size: int = 1,
               label=None, steps: Optional[int] = None,
               resolution: Optional[int] = None, save_paths=None,
               split_small=None, fast_mesh: bool = False,
               compute_sdf: bool = True):
        """Three-hop cascade (`octfusion_model_union_3t.py:152-214`)."""
        m = self.cfg.model
        k1, k2, k3 = jax.random.split(key, 3)
        if split_small is None:
            split_small = self._jit(
                "sample_lr", self.sample_lr,
                static_argnames=("batch_size", "steps"),
            )(params, k1, batch_size=batch_size, label=label, steps=steps)
        spec = self.spec1.with_batch_size(batch_size)

        def grow_small(split):
            o = split_codec.split2octree_small(split, spec)
            g = build_dual_graph(o, self.edge_factor, up_to=self.hr_depth)
            if use_fused_conv():
                g = with_conv_plans(g)
            return o, g

        octree_small, g6 = self._jit(f"grow6_{batch_size}", grow_small)(
            split_small
        )
        if self.stage_flag == "lr":
            return {"split_small": split_small, "octree_small": octree_small}

        split_large = self._jit(
            "sample_hr",
            lambda p, k, g, lb, batch_size, steps: self.sample_stage(
                p, k, g, lb, self.hr_depth, 8, "hr", batch_size, steps
            ),
            static_argnames=("batch_size", "steps"),
        )(params, k2, g6, label, batch_size=batch_size, steps=steps)

        def grow_large(o, split_full):
            cur = split_full[g6.spec.cur_off(self.hr_depth):]
            o2 = split_codec.split2octree_large(o, cur, self.hr_depth)
            g = build_dual_graph(o2, self.edge_factor, up_to=self.code_depth)
            if use_fused_conv():
                g = with_conv_plans(g)
            return o2, g

        octree_large, g8 = self._jit(f"grow8_{batch_size}", grow_large)(
            octree_small, split_large
        )
        if self.stage_flag == "hr":
            return {
                "split_small": split_small, "split_large": split_large,
                "octree_large": octree_large,
            }

        code = self._jit(
            "sample_feature",
            lambda p, k, g, lb, batch_size, steps: self.sample_stage(
                p, k, g, lb, self.code_depth, m.embed_dim, "feature",
                batch_size, steps,
            ),
            static_argnames=("batch_size", "steps"),
        )(params, k3, g8, label, batch_size=batch_size, steps=steps)

        out = self._jit(
            "decode",
            lambda vp, c, g: self.vae.apply(
                vp, c, g, method=GraphVAE.decode_grow
            ),
        )(vae_params, code, g8)
        if not compute_sdf:
            return {
                "split_small": split_small, "split_large": split_large,
                "code": code, "decode_out": out,
                "overflow": g8.any_overflow(),
            }
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
            sdfs = None
        else:
            sdfs = sdf_utils.calc_sdf(
                out["reg_voxs"][m.depth_out], out["octree_out"],
                m.full_depth, m.depth_out, batch_size=batch_size, size=res,
                bbmin=-self.cfg.solver.sdf_scale,
                bbmax=self.cfg.solver.sdf_scale,
            )
            if save_paths is not None:
                sdf_utils.export_meshes(
                    sdfs, save_paths,
                    bbmin=-self.cfg.solver.sdf_scale,
                    bbmax=self.cfg.solver.sdf_scale,
                    mesh_scale=self.cfg.data_test.point_scale,
                )
        return {
            "split_small": split_small, "split_large": split_large,
            "code": code, "sdfs": sdfs, "decode_out": out,
            "overflow": g8.any_overflow(),
        }
