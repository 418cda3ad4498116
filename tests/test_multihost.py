"""2-process multi-host integration test (VERDICT r2 item #7).

Launches two real OS processes that join one JAX multi-controller runtime
over a local coordinator (CPU backend, 2 forced devices each -> a global
4-device mesh), then asserts:

* loader striping: the rank-striped ``InfiniteSampler`` streams are
  disjoint within each epoch and cover the dataset;
* parameter sync: after 3 data-parallel steps where each rank feeds
  DIFFERENT rows, both ranks hold identical parameters equal to a numpy
  simulation of the globally-averaged SGD — i.e. the pmean actually rode
  the cross-process collective.

Reference analogue: torchrun + DDP allreduce
(`options/base_options.py:106-116`, `octfusion_model_union.py:180-196`),
which the reference never tests multi-process at all (SURVEY.md §4).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp(tmp_path):
    port = _free_port()
    here = os.path.dirname(__file__)
    worker = os.path.join(here, "multihost_worker.py")
    procs, outs = [], []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            OCTFUSION_COORDINATOR=f"127.0.0.1:{port}",
            OCTFUSION_NUM_PROCESSES="2",
            OCTFUSION_PROCESS_ID=str(rank),
            PYTHONPATH=os.pathsep.join(
                [os.path.dirname(here), here,
                 env.get("PYTHONPATH", "")]
            ),
        )
        out = tmp_path / f"rank{rank}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(rank), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    r0, r1 = (json.loads(o.read_text()) for o in outs)

    # ---- loader striping -------------------------------------------------
    # 8 samples / 2 ranks -> 4 per epoch each; the two epochs captured
    e0a, e0b = r0["indices"][:4], r1["indices"][:4]
    assert not set(e0a) & set(e0b), "rank streams overlap"
    assert set(e0a) | set(e0b) == set(range(8)), "epoch does not cover"
    e1a, e1b = r0["indices"][4:], r1["indices"][4:]
    assert set(e1a) | set(e1b) == set(range(8))

    # ---- parameter sync --------------------------------------------------
    w0, w1 = np.asarray(r0["w"]), np.asarray(r1["w"])
    np.testing.assert_allclose(w0, w1, rtol=0, atol=0)

    # numpy oracle of the globally-averaged SGD (4 device rows, lr 0.1)
    B, M = 4, 4
    rows = np.arange(B)
    pos = (rows[:, None, None] + 0.1 * np.arange(M)[None, :, None]
           + 0.01 * np.arange(3)[None, None, :]).astype(np.float32)
    sdf = (0.5 * rows[:, None] + 0.05 * np.arange(M)[None, :]).astype(
        np.float32)
    w = np.zeros(3, np.float32)
    for _ in range(3):
        pred = (pos * w).sum(-1)                       # [B, M]
        # per-device loss = mean over its own M queries; grads pmean'd
        g = np.mean(
            2.0 * (pred - sdf)[:, :, None] * pos, axis=(0, 1)
        ).astype(np.float32)
        w = w - 0.1 * g
    np.testing.assert_allclose(w0, w, rtol=2e-5, atol=2e-6)
