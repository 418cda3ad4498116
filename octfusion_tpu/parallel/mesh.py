"""Device mesh helpers (`jax.sharding`), replacing the reference's
torchrun/DDP topology (SURVEY.md §2.3: the reference's only strategy is
single-node data parallelism)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model <= n
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))
