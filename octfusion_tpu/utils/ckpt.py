"""Checkpointing: orbax save/restore with the reference's rotation and
auto-resume contract (SURVEY.md §5.4; `octfusion_model_union.py:501-545`).

Layout: ``<ckpt_dir>/steps-<N>/`` orbax trees plus ``steps-latest`` updated
every ``save_latest_freq``; the newest ``ckpt_num`` step dirs are kept.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def save(ckpt_dir: str, tree: Any, step: int, ckpt_num: int = 5,
         latest: bool = True):
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), f"steps-{step}")
    ckptr = _checkpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    # A crash mid-save (SIGKILL between orbax's tmp write and its atomic
    # rename — observed when the stall watchdog fired during a q4_hr save)
    # leaves `steps-<N>.orbax-checkpoint-tmp*` behind; orbax then fails the
    # NEXT save at the same step with FileExistsError on the rename.  This
    # process is the run dir's single writer, so stale tmps are safe to
    # clear here.
    _clear_stale_tmp(ckpt_dir, step)
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    if latest:
        lpath = os.path.join(os.path.abspath(ckpt_dir), "steps-latest")
        if os.path.islink(lpath) or os.path.exists(lpath):
            if os.path.islink(lpath):
                os.unlink(lpath)
            else:
                shutil.rmtree(lpath)
        os.symlink(path, lpath)
    rotate(ckpt_dir, ckpt_num)
    return path


def _clear_stale_tmp(ckpt_dir: str, step: Optional[int] = None):
    """Remove orbax tmp dirs left by a killed save — for ``step`` only, or
    all of them (rotation).  Final ``steps-<N>`` dirs are never touched."""
    prefix = "steps-" if step is None else f"steps-{step}."
    for name in os.listdir(ckpt_dir):
        if name.startswith(prefix) and ".orbax-checkpoint-tmp" in name:
            shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)


def rotate(ckpt_dir: str, ckpt_num: int):
    """Keep only the newest ``ckpt_num`` step checkpoints
    (`octfusion_model_union.py:516-521`); also sweeps any stale orbax tmp
    dirs so one crashed save cannot poison the run dir forever."""
    _clear_stale_tmp(ckpt_dir)
    entries = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"steps-(\d+)", name)
        if m:
            entries.append((int(m.group(1)), name))
    entries.sort()
    for _, name in entries[:-ckpt_num] if ckpt_num > 0 else []:
        shutil.rmtree(os.path.join(ckpt_dir, name))


def restore(path: str, example_tree: Any) -> Any:
    path = os.path.abspath(path)
    if example_tree is None:
        # Template-less restore (e.g. --vq_ckpt / --pretrain_ckpt grafting).
        # The orbax default replays the shardings recorded at save time,
        # which fails when the checkpoint moves across topologies (saved on
        # the TPU, restored on a CPU host or a different slice).  Restore as
        # host numpy arrays instead — callers re-place them on device.
        import jax
        import numpy as np

        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata.tree
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta,
            is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
        )
        return ckptr.restore(path, restore_args=restore_args)
    return _checkpointer().restore(path, example_tree)


def latest_path(ckpt_dir: str) -> Optional[str]:
    """Auto-resume contract: the latest checkpoint if one exists
    (`octfusion_model_union.py:150-160`)."""
    p = os.path.join(ckpt_dir, "steps-latest")
    if os.path.exists(p):
        return p
    entries = []
    if os.path.isdir(ckpt_dir):
        for name in os.listdir(ckpt_dir):
            m = re.fullmatch(r"steps-(\d+)", name)
            if m:
                entries.append((int(m.group(1)), name))
    if not entries:
        return None
    entries.sort()
    return os.path.join(ckpt_dir, entries[-1][1])
