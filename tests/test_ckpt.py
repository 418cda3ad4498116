"""Checkpoint save/restore/rotate/auto-resume tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from octfusion_tpu.utils import ckpt as ckpt_lib


def make_state(v):
    return {
        "step": jnp.asarray(v, jnp.int32),
        "params": {"w": jnp.full((4, 4), float(v)), "b": jnp.zeros((4,))},
    }


def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    state = make_state(3)
    ckpt_lib.save(d, state, step=3, ckpt_num=2)
    restored = ckpt_lib.restore(os.path.join(d, "steps-3"), make_state(0))
    assert int(restored["step"]) == 3
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 3.0)


def test_rotation_and_latest(tmp_path):
    d = str(tmp_path / "ckpt")
    for s in [1, 2, 3, 4]:
        ckpt_lib.save(d, make_state(s), step=s, ckpt_num=2)
    names = sorted(os.listdir(d))
    kept = [n for n in names if n.startswith("steps-") and n != "steps-latest"]
    assert kept == ["steps-3", "steps-4"], kept
    lp = ckpt_lib.latest_path(d)
    restored = ckpt_lib.restore(lp, make_state(0))
    assert int(restored["step"]) == 4


def test_latest_path_empty(tmp_path):
    assert ckpt_lib.latest_path(str(tmp_path / "nope")) is None


def test_templateless_restore_is_host_numpy(tmp_path):
    """`restore(path, None)` (the --vq_ckpt / --pretrain_ckpt grafting path)
    must materialise host numpy arrays and ignore the shardings recorded at
    save time — a checkpoint written on the TPU must load on a CPU host
    (`models/model_utils.py:6-35` tolerance contract)."""
    d = str(tmp_path / "ckpt")
    ckpt_lib.save(d, make_state(5), step=5, ckpt_num=2)
    out = ckpt_lib.restore(os.path.join(d, "steps-5"), None)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves and all(isinstance(x, np.ndarray) for x in leaves), [
        type(x) for x in leaves
    ]
    np.testing.assert_allclose(out["params"]["w"], 5.0)


def test_save_clears_stale_orbax_tmp(tmp_path):
    """A save killed between orbax's tmp write and its atomic rename leaves
    `steps-<N>.orbax-checkpoint-tmp` behind; the next save at the same step
    must clear it instead of dying with FileExistsError on the rename
    (observed live in the round-4 q4_hr run when the watchdog fired
    mid-save)."""
    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    stale = os.path.join(d, "steps-5.orbax-checkpoint-tmp")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("partial write")
    ckpt_lib.save(d, make_state(5), step=5, ckpt_num=2)
    assert not os.path.exists(stale)
    restored = ckpt_lib.restore(os.path.join(d, "steps-5"), make_state(0))
    assert int(restored["step"]) == 5


def test_rotate_sweeps_all_stale_tmps(tmp_path):
    d = str(tmp_path / "ckpt")
    ckpt_lib.save(d, make_state(1), step=1, ckpt_num=2)
    for n in ["steps-1.orbax-checkpoint-tmp", "steps-9.orbax-checkpoint-tmp-x"]:
        os.makedirs(os.path.join(d, n))
    ckpt_lib.rotate(d, ckpt_num=2)
    left = [n for n in os.listdir(d) if ".orbax-checkpoint-tmp" in n]
    assert left == [], left
    assert os.path.isdir(os.path.join(d, "steps-1"))
