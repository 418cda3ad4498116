"""Structured configuration tree (dataclasses + YAML).

Replaces the reference's argparse + two OmegaConf YAMLs
(`/root/reference/options/base_options.py`,
`configs/vae_snet_train.yaml`, `configs/octfusion_snet_uncond.yaml`) with
one typed tree.  TPU-specific additions: static octree capacities (the
shape-bucketing contract) and mesh/parallelism settings.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import yaml

from .octree.octree import OctreeSpec


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    sdf_scale: float = 0.9
    resolution: int = 256
    save_sdf: bool = False


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    depth: int = 8
    channel_in: int = 4
    full_depth: int = 4
    depth_stop: int = 6
    depth_out: int = 8
    embed_dim: int = 3
    resblk_num: int = 2
    channels: Tuple[int, ...] = (4, 512, 512, 256, 128, 64, 32, 32, 24, 8)
    use_checkpoint: bool = True
    # rematerialisation policy for the res blocks: "full" (reference
    # behaviour — recompute the whole block in the backward), "conv"
    # (save GraphConv outputs, recompute only norm/swish glue), "dots",
    # or "none"; see nn/modules.py::remat_transform and the A/B
    # measurement in results/vae_remat_ab.json
    remat_policy: str = "full"


@dataclasses.dataclass(frozen=True)
class CapacityConfig:
    """Static per-depth node capacities (per sample)."""

    finest_cap: int = 131072
    decay: float = 4.0
    # edges per graph vertex bound; measured ~5.5-7.9 on real shapes
    # (overflow is flagged, never silent)
    edge_factor: int = 9
    caps_override: Optional[Tuple[Optional[int], ...]] = None

    def octree_spec(self, depth, full_depth, batch_size=1) -> OctreeSpec:
        return OctreeSpec.create(
            depth, full_depth, batch_size,
            finest_cap_per_sample=self.finest_cap,
            decay=self.decay,
            caps_override=self.caps_override,
        )


@dataclasses.dataclass(frozen=True)
class DataConfig:
    location: str = ""
    filelist: str = ""
    name: str = "shapenet"           # or "synthetic"
    batch_size: int = 4
    point_scale: float = 0.5
    point_sample_num: int = 10000
    points_per_shape: int = 65536    # static point-cloud size per sample
    load_sdf: bool = True
    load_pointcloud: bool = True
    load_split_small: bool = False
    load_color: bool = False
    shuffle: bool = True
    num_workers: int = 4
    in_memory: bool = False
    # synthetic only: labels select distinct shape families (the stand-in
    # for the reference's 5-class conditional workload, run_snet_cond.sh)
    class_families: bool = False


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    timesteps: int = 1000
    noise_schedule: str = "linear"
    ddim_steps: int = 200
    # 'ancestral' = the reference's exact update rules; 'dpmpp' =
    # DPM-Solver++(2M), the TPU fast path (~4x fewer denoiser calls;
    # occupancy pre-flights show it at least as split-faithful as
    # ancestral on identical weights — METRICS_r03.md; scored-metric
    # parity is measured in METRICS_r04.md).  Pair 'dpmpp' with a
    # reduced ddim_steps (e.g. 50).
    sampler: str = "ancestral"
    truncated_time: float = 0.7
    # Occupancy weighting for the lr stage's x0-MSE: entries whose
    # ground-truth split value is positive (occupied — ~4-5% of the grid,
    # reference codec `utils/util_dualoctree.py:199-211`) get this weight,
    # empty entries weight 1.  1.0 = reference-parity unweighted loss.
    # Counters the measured mode-collapse toward the all-empty grid at
    # short training budgets (METRICS_r03.md run-v1 post-mortem; the
    # reference's remedy is a 3000-epoch schedule).
    lr_pos_weight: float = 1.0
    ema_rate: float = 0.999
    unet_type: Tuple[str, ...] = ("lr", "hr")
    df_type: Tuple[str, ...] = ("x0", "eps")
    input_depth: Tuple[int, ...] = (4, 6)
    input_channels: Tuple[int, ...] = (8, 3)
    out_channels: Tuple[int, ...] = (8, 3)
    model_channels: Tuple[int, ...] = (64, 128)
    num_res_blocks: Tuple[Tuple[int, ...], ...] = ((1, 1, 1), (1, 1, 0))
    channel_mult: Tuple[Tuple[int, ...], ...] = ((1, 2, 4), (1, 2, 4))
    attention_resolutions: Tuple[int, ...] = (2, 4)
    num_heads: int = 4
    num_classes: Optional[int] = None
    compute_dtype: str = "float32"   # 'bfloat16' for mixed precision


@dataclasses.dataclass(frozen=True)
class LossConfig:
    name: str = "geometry"
    loss_type: str = "sdf_reg_loss"
    kl_weight: float = 0.1
    # 'analytic' = one-pass SDF+spatial-gradient with shared corner lookups
    # (nn/losses.py); 'jvp' = the original 4-pass forward-mode formulation
    spatial_grad: str = "analytic"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 2e-4
    epochs: int = 500
    seed: int = 42
    ckpt_num: int = 5
    print_freq: int = 25
    save_latest_freq: int = 500
    save_steps_freq: int = 3000
    display_freq: int = 100000
    logs_dir: str = "logs"
    name: str = "run"
    weight_decay: float = 0.01


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / parallelism settings (TPU-native; the reference's only
    strategy is single-node DDP — SURVEY.md §2.3)."""

    data_axis: int = -1   # -1: all devices
    model_axis: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    solver: SolverConfig = SolverConfig()
    model: VAEConfig = VAEConfig()
    capacity: CapacityConfig = CapacityConfig()
    data: DataConfig = DataConfig()
    data_test: DataConfig = DataConfig(batch_size=1, shuffle=False)
    diffusion: DiffusionConfig = DiffusionConfig()
    loss: LossConfig = LossConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()


def _build(cls, d):
    if d is None:
        return cls()
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k} for {cls.__name__}")
        ft = fields[k].type
        if dataclasses.is_dataclass(fields[k].default.__class__) and isinstance(v, dict):
            kwargs[k] = _build(fields[k].default.__class__, v)
        elif isinstance(v, list):
            kwargs[k] = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        else:
            kwargs[k] = v
        del ft
    return cls(**kwargs)


def load_config(path: str) -> Config:
    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    return _build(Config, raw)


def dump_config(cfg: Config, path: str):
    with open(path, "w") as fh:
        yaml.safe_dump(dataclasses.asdict(cfg), fh, sort_keys=False)
