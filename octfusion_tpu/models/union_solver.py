"""Two-stage ("union") diffusion solver
(`/root/reference/models/octfusion_model_union.py`): lr stage denoises the
dense split grid, hr stage denoises frozen-VAE latents on the dual graph
with the frozen lr U-Net as its middle; cascade sampling produces an SDF
grid and a mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..diffusion import ema as ema_lib
from ..diffusion import sampler, schedule
from ..nn.unet_union import UNetUnion, UnionConfig
from ..nn.vae import GraphVAE
from ..octree import split_codec
from ..octree.dual_graph import build_dual_graph, with_conv_plans
from ..utils import sdf as sdf_utils
from .common import (TrainState, batch_to_graph, batch_to_graph_jit,
                     batch_to_octree)


def use_fused_conv() -> bool:
    """The Pallas fused conv is the default on TPU for sampling-time graphs
    (topology fixed across steps); OCTFUSION_FUSED_CONV=0 disables it."""
    import os

    import jax

    flag = os.environ.get("OCTFUSION_FUSED_CONV", "1")
    return flag != "0" and jax.default_backend() == "tpu"


def use_kpack() -> bool:
    """K-packed fused-conv plans for SAMPLING graphs (forward-only;
    experimental).  OCTFUSION_CONV_KPACK=1 enables."""
    import os

    return os.environ.get("OCTFUSION_CONV_KPACK", "0") == "1"


def use_fused_train() -> bool:
    """Fused convs in TRAIN steps (plan built inside the jitted step, since
    training topology changes per batch).  Off by default until it wins on
    the target hardware; OCTFUSION_FUSED_TRAIN=1 enables."""
    import os

    import jax

    flag = os.environ.get("OCTFUSION_FUSED_TRAIN", "0")
    return flag == "1" and jax.default_backend() == "tpu"


class UnionSolver:
    def __init__(self, cfg: Config, stage_flag: str = "hr"):
        self.cfg = cfg
        self.stage_flag = stage_flag
        d = cfg.diffusion
        self.union_cfg = UnionConfig(
            unet_type=tuple(d.unet_type), df_type=tuple(d.df_type),
            input_depth=tuple(d.input_depth), full_depth=cfg.model.full_depth,
            input_channels=tuple(d.input_channels),
            out_channels=tuple(d.out_channels),
            model_channels=tuple(d.model_channels),
            num_res_blocks=tuple(tuple(x) for x in d.num_res_blocks),
            channel_mult=tuple(tuple(x) for x in d.channel_mult),
            attention_resolutions=tuple(d.attention_resolutions),
            num_heads=d.num_heads, num_classes=d.num_classes,
            compute_dtype=d.compute_dtype,
        )
        self.df = UNetUnion(self.union_cfg, stage_flag)
        m = cfg.model
        self.vae = GraphVAE(
            depth=m.depth, channel_in=m.channel_in, full_depth=m.full_depth,
            depth_stop=m.depth_stop, depth_out=m.depth_out,
            embed_dim=m.embed_dim, resblk_num=m.resblk_num,
            channels=tuple(m.channels), use_checkpoint=m.use_checkpoint,
        )
        if "hr" in d.unet_type and "feature" not in d.unet_type:
            i = d.unet_type.index("hr")
            assert d.input_channels[i] == m.embed_dim, (
                "hr stage denoises VAE codes: diffusion.input_channels[hr] "
                f"({d.input_channels[i]}) must equal model.embed_dim "
                f"({m.embed_dim})"
            )
        self.spec1 = cfg.capacity.octree_spec(m.depth, m.full_depth, 1)
        self.edge_factor = cfg.capacity.edge_factor
        self.log_snr = schedule.get_log_snr(d.noise_schedule)
        self.small_depth = m.depth_stop
        self.df_type = dict(zip(d.unet_type, d.df_type))

    # ------------------------------------------------------------------
    def init_params(self, key, batch):
        """Initialise diffusion params covering every built stage."""
        b = (batch["points"] if "points" in batch else batch["label"]).shape[0]
        spec = self.spec1.with_batch_size(b)
        fd = self.cfg.model.full_depth
        s = 2**fd
        lr_x = jnp.zeros((b, s, s, s, 8))
        t = jnp.zeros((b,))
        label = (
            jnp.zeros((b,), jnp.int32)
            if self.union_cfg.num_classes is not None else None
        )
        hr_x = None
        g = None
        if self.stage_flag != "lr":
            _, g = batch_to_graph_jit(
                jnp.asarray(batch["points"]), jnp.asarray(batch["normals"]),
                self.spec1, self.edge_factor, up_to=self.small_depth,
            )
            lvl = g.level(self.small_depth)
            hr_x = jnp.zeros((lvl.g_cap, self.cfg.model.embed_dim))
        del spec
        return jax.jit(
            partial(self.df.init, method=UNetUnion.warmup)
        )(key, lr_x, hr_x, g, t, label=label)

    # ------------------------------------------------------------------
    def make_optimizer(self):
        # AdamW + StepLR(1000, 0.9) (`octfusion_model_union.py:142-143`)
        def sched(step):
            return self.cfg.train.lr * 0.9 ** (step // 1000)

        tx = optax.adamw(sched, weight_decay=self.cfg.train.weight_decay)
        if self.stage_flag == "hr":
            # freeze the lr U-Net (`octfusion_model_union.py:130-137`)
            def label_fn(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "frozen"
                    if any(getattr(p, "key", None) == "unet_lr" for p in path)
                    else "train",
                    params,
                )

            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()}, label_fn
            )
        return tx

    def init_state(self, key, batch) -> TrainState:
        params = self.init_params(key, batch)
        tx = self.make_optimizer()
        return TrainState(
            step=jnp.asarray(0, jnp.int32), params=params,
            opt_state=tx.init(params), ema_params=params,
        )

    # ------------------------------------------------------------------
    def loss_fn(self, params, vae_params, batch, key):
        label = (
            batch.get("label")
            if self.union_cfg.num_classes is not None else None
        )
        if self.stage_flag == "lr":
            if "split_small" in batch:
                # precomputed fast path (`dualoctree_snet.py:142-145`,
                # tools/precompute_splits.py)
                split = batch["split_small"]
                b = split.shape[0]
            else:
                b = batch["points"].shape[0]
                octree = batch_to_octree(
                    batch["points"], batch["normals"], self.spec1
                )
                split = split_codec.octree2split_small(octree)
            pw = self.cfg.diffusion.lr_pos_weight
            # occupancy-weighted x0-MSE: upweight the rare occupied (+1)
            # split entries (~4-5% of the grid) to counter mode collapse
            # toward all-empty at short training budgets (METRICS_r03.md
            # run-v1 post-mortem); pw=1.0 is the reference-parity mean
            elem_w = jnp.where(split > 0, pw, 1.0) if pw != 1.0 else None
            loss = sampler.diffusion_loss(
                lambda noised, snr: self.df.apply(
                    params, "lr", noised, snr, label=label
                ),
                key, split, None, b, self.log_snr, self.df_type["lr"],
                elem_weight=elem_w,
            )
            ld = {"loss": loss}
            if "split_small" not in batch:
                ld["overflow"] = jnp.any(octree.overflow).astype(jnp.float32)
            return loss, ld
        # hr stage: frozen VAE encode (`octfusion_model_union.py:285-291`)
        b = batch["points"].shape[0]
        octree, g = batch_to_graph(
            batch["points"], batch["normals"], self.spec1, self.edge_factor
        )
        if use_fused_train():
            # plans only for the hr U-Net's levels (<= small_depth): that is
            # where forward AND backward convs run; the frozen encode above
            # small_depth stays on the XLA path
            g = with_conv_plans(
                g,
                depths=tuple(
                    range(self.cfg.model.full_depth, self.small_depth + 1)
                ),
            )
        ekey, dkey = jax.random.split(key)
        code = jax.lax.stop_gradient(
            self.vae.apply(
                vae_params, g, ekey, method=GraphVAE.extract_code
            )
        )
        lvl = g.level(self.small_depth)
        loss = sampler.diffusion_loss(
            lambda noised, snr: self.df.apply(
                params, "hr", noised, snr, g=g, label=label
            ),
            dkey, code, lvl.node_batch, b, self.log_snr,
            self.df_type["hr"], mask=lvl.node_mask,
        )
        del octree
        return loss, {"loss": loss,
                      "overflow": g.any_overflow().astype(jnp.float32)}

    def make_train_step(self):
        tx = self.make_optimizer()
        ema_rate = self.cfg.diffusion.ema_rate

        @jax.jit
        def step(state: TrainState, vae_params, batch, key):
            (loss, ld), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True
            )(state.params, vae_params, batch, key)
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

        return step

    # ------------------------------------------------------------------
    # sampling cascade (`octfusion_model_union.py:354-401`)
    # ------------------------------------------------------------------
    def sample_lr(self, params, key, batch_size: int, label=None,
                  steps: Optional[int] = None, noise_stream=None,
                  eta: float = 1.0):
        fd = self.cfg.model.full_depth
        s = 2**fd
        dcfg = self.cfg.diffusion

        def denoise(x, tb, x_start):
            return self.df.apply(
                params, "lr", x, tb, x_self_cond=x_start, label=label
            )

        # split grid is NDHWC here vs the reference's NCDHW — transpose an
        # ingested reference stream accordingly
        if noise_stream is not None:
            noise_stream = jnp.transpose(
                jnp.asarray(noise_stream), (0, 1, 3, 4, 5, 2)
            )
        return sampler.sample_loop(
            denoise, key, (batch_size, s, s, s, 8), batch_size,
            steps or dcfg.ddim_steps, self.log_snr,
            df_type=self.df_type["lr"],
            truncated_index=dcfg.truncated_time, snap_sign=True,
            noise_stream=noise_stream, eta=eta, solver=dcfg.sampler,
        )

    def sample_hr(self, params, key, g, batch_size: int, label=None,
                  steps: Optional[int] = None, noise_stream=None,
                  eta: float = 1.0):
        lvl = g.level(self.small_depth)
        dcfg = self.cfg.diffusion

        def denoise(x, tb, x_start):
            return self.df.apply(
                params, "hr", x, tb, g=g, label=label
            )

        code = sampler.sample_loop(
            denoise, key, (lvl.g_cap, self.cfg.model.embed_dim), batch_size,
            steps or dcfg.ddim_steps, self.log_snr,
            df_type=self.df_type["hr"],
            noise_stream=noise_stream, eta=eta, solver=dcfg.sampler,
        )
        return jnp.where(lvl.node_mask[:, None], code, 0.0)

    def dp_cascade(self, params, vae_params, key, label=None,
                   steps: Optional[int] = None):
        """One shape's full generation cascade as a single traceable fn —
        the per-device body of the shard_map DP-generation path
        (`parallel.train_step.make_dp_sample`; reference work sharding
        `train.py:166-177`).  Returns the growing-decode output
        (``reg_voxs`` + ``octree_out``); the caller evaluates the SDF grid."""
        k1, k2 = jax.random.split(key)
        split = self.sample_lr(params, k1, batch_size=1, label=label,
                               steps=steps)
        octree = split_codec.split2octree_small(split, self.spec1)
        g = build_dual_graph(octree, self.edge_factor, up_to=self.small_depth)
        if use_fused_conv():
            g = with_conv_plans(g)
        code = self.sample_hr(params, k2, g, batch_size=1, label=label,
                              steps=steps)
        return self.vae.apply(vae_params, code, g,
                              method=GraphVAE.decode_grow)

    def export_octree(self, octree, depth: int, save_paths):
        """Dump octree occupancy at ``depth`` as cube-face OBJ meshes
        (`octfusion_model_union.py:403-422`)."""
        import numpy as np

        from ..utils import mesh as mesh_utils

        occ = octree.node_mask(depth).astype(jnp.float32)[:, None]
        vox = np.asarray(octree.to_voxel(occ, depth))[..., 0]
        for i, path in enumerate(save_paths):
            v, f = mesh_utils.voxel_to_cube_mesh(vox[i])
            mesh_utils.save_obj(path, v, f)

    def _jit(self, name, fn, **kw):
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn, **kw)
        return self._jit_cache[name]

    def _grow_fn(self, batch_size: int):
        """split grid -> (octree, dual graph [+conv plans]); shared by
        ``sample`` and ``warm_compile`` so both jit the same program."""
        spec = self.spec1.with_batch_size(batch_size)

        def grow(split):
            octree_small = split_codec.split2octree_small(split, spec)
            g_small = build_dual_graph(
                octree_small, self.edge_factor, up_to=self.small_depth
            )
            # fused-conv descriptor plans: built once per shape, reused by
            # every conv of all 200 hr sampling steps (~1.5x step win on
            # v5e, PERF.md)
            if use_fused_conv():
                g_small = with_conv_plans(g_small, packed=use_kpack())
            return octree_small, g_small

        return grow

    def _decode_fn(self):
        return lambda vp, c, g: self.vae.apply(
            vp, c, g, method=GraphVAE.decode_grow
        )

    def warm_compile(self, params, vae_params, batch_size: int = 1,
                     label=None, steps: Optional[int] = None,
                     executor=None, stages=("lr", "grow", "hr", "decode")):
        """AOT-compile the stage programs of :meth:`sample` CONCURRENTLY.

        Cold remote compiles through the axon tunnel cost 50-300 s *per
        program* and :meth:`sample` compiles its ~4 programs serially on
        first call (the bulk of the ~957 s round-3 cold setup, VERDICT r3
        weak #4).  The stages form a chain, but their *shapes* are static:
        ``jax.eval_shape`` walks the chain host-side in milliseconds, after
        which every program can be lowered+compiled in parallel threads —
        cold setup drops from the sum of compile times toward the max.
        Compiled executables also land in the persistent compilation cache,
        so the subsequent :meth:`sample` calls pay tracing only.

        Returns the list of futures when ``executor`` is given (caller
        waits), else blocks until all programs are built.
        """
        from concurrent.futures import ThreadPoolExecutor

        m = self.cfg.model
        fd = m.full_depth
        s = 2**fd
        key = jax.random.PRNGKey(0)
        split_spec = jax.ShapeDtypeStruct(
            (batch_size, s, s, s, 8), jnp.float32)

        jobs = []
        if "lr" in stages:
            jit_lr = self._jit("sample_lr", self.sample_lr,
                               static_argnames=("batch_size", "steps"))
            jobs.append(lambda: jit_lr.lower(
                params, key, batch_size=batch_size, label=label,
                steps=steps).compile())
        grow = self._grow_fn(batch_size)
        jit_grow = self._jit(f"grow_{batch_size}", grow)
        if "grow" in stages:
            jobs.append(lambda: jit_grow.lower(split_spec).compile())
        if self.stage_flag != "lr" and ("hr" in stages or "decode" in stages):
            _, g_spec = jax.eval_shape(grow, split_spec)
            if "hr" in stages:
                jit_hr = self._jit("sample_hr", self.sample_hr,
                                   static_argnames=("batch_size", "steps"))
                jobs.append(lambda: jit_hr.lower(
                    params, key, g_spec, batch_size=batch_size, label=label,
                    steps=steps).compile())
            if "decode" in stages:
                lvl = g_spec.level(self.small_depth)
                code_spec = jax.ShapeDtypeStruct(
                    (lvl.g_cap, m.embed_dim), jnp.float32)
                jit_dec = self._jit("decode", self._decode_fn())
                jobs.append(lambda: jit_dec.lower(
                    vae_params, code_spec, g_spec).compile())

        if executor is not None:
            return [executor.submit(j) for j in jobs]
        with ThreadPoolExecutor(max_workers=len(jobs) or 1) as ex:
            for f in [ex.submit(j) for j in jobs]:
                f.result()
        return None

    def sample(self, params, vae_params, key, batch_size: int = 1,
               label=None, steps: Optional[int] = None,
               resolution: Optional[int] = None, save_paths=None,
               split_small=None, compute_sdf: bool = True,
               fast_mesh: bool = False):
        """Full generation cascade, each stage jitted once
        (`octfusion_model_union.py:354-401`)."""
        m = self.cfg.model
        k1, k2 = jax.random.split(key)
        if split_small is None:
            split_small = self._jit(
                "sample_lr", self.sample_lr,
                static_argnames=("batch_size", "steps"),
            )(params, k1, batch_size=batch_size, label=label, steps=steps)

        octree_small, g_small = self._jit(
            f"grow_{batch_size}", self._grow_fn(batch_size)
        )(split_small)
        if self.stage_flag == "lr":
            return {"split_small": split_small, "octree_small": octree_small}
        code = self._jit(
            "sample_hr", self.sample_hr,
            static_argnames=("batch_size", "steps"),
        )(params, k2, g_small, batch_size=batch_size, label=label, steps=steps)
        out = self._jit("decode", self._decode_fn())(
            vae_params, code, g_small
        )
        if not compute_sdf:
            return {
                "split_small": split_small,
                "octree_small": octree_small,
                "code": code,
                "decode_out": out,
                # device scalar; fetch lazily -- True means a static cap
                # (nodes/edges/conv-plan descriptors) truncated this shape
                "overflow": g_small.any_overflow(),
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
            "split_small": split_small,
            "octree_small": octree_small,
            "code": code,
            "sdfs": sdfs,
            "decode_out": out,
            "overflow": g_small.any_overflow(),
        }
