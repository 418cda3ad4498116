"""Config system tests: YAML round-trip, real-scale configs construct."""

import dataclasses
import os

import pytest

from octfusion_tpu import config as config_lib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_reference_parity_config():
    cfg = config_lib.load_config(
        os.path.join(REPO, "configs", "octfusion_snet_uncond.yaml")
    )
    assert cfg.model.depth == 8
    assert cfg.model.channels[8] == 24
    assert cfg.diffusion.model_channels == (64, 128)
    assert cfg.diffusion.num_res_blocks == ((1, 1, 1), (1, 1, 0))
    spec = cfg.capacity.octree_spec(cfg.model.depth, cfg.model.full_depth, 1)
    assert spec.node_caps[4] == 4096
    assert spec.node_caps[8] == 131072
    # solvers construct at real scale (no arrays touched)
    from octfusion_tpu.models.union_solver import UnionSolver
    from octfusion_tpu.models.vae_solver import VAESolver

    UnionSolver(cfg, stage_flag="hr")
    VAESolver(cfg)


def test_load_tiny_config_and_dump_roundtrip(tmp_path):
    cfg = config_lib.load_config(
        os.path.join(REPO, "configs", "synthetic_tiny.yaml")
    )
    assert cfg.data.name == "synthetic"
    p = str(tmp_path / "dump.yaml")
    config_lib.dump_config(cfg, p)
    cfg2 = config_lib.load_config(p)
    assert cfg2.model == cfg.model
    assert cfg2.diffusion == dataclasses.replace(cfg.diffusion)


def test_unknown_key_rejected(tmp_path):
    p = str(tmp_path / "bad.yaml")
    with open(p, "w") as fh:
        fh.write("model:\n  not_a_field: 3\n")
    with pytest.raises(KeyError):
        config_lib.load_config(p)


def test_hr_embed_dim_mismatch_caught():
    from octfusion_tpu.models.union_solver import UnionSolver

    cfg = config_lib.Config(
        model=config_lib.VAEConfig(embed_dim=7),
    )
    with pytest.raises(AssertionError):
        UnionSolver(cfg, stage_flag="hr")
