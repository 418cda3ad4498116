"""Reference-compatible sampling noise streams (SURVEY §7.3.3).

The reference seeds ``torch`` before each sampling stage
(`octfusion_model_union.py:372` lr: ``seed + save_index``; `:390` hr:
``seed``) and draws ``torch.randn`` in a fixed order: the initial state,
then — for the x0 parameterisation only — one tensor per ancestral step
(`:308,339-344`; the eps path draws no per-step noise).  These helpers
reproduce that stream with torch's CPU generator so converted checkpoints
can regenerate reference *CPU* samples bit-comparably; CUDA runs use a
different generator (Philox), for which the ingestion hook
(`diffusion/sampler.sample_loop(noise_stream=...)``) accepts noise captured
from the reference process instead.
"""

from __future__ import annotations

import numpy as np


def reference_lr_noise(seed: int, save_index: int, shape, steps: int
                       ) -> np.ndarray:
    """[steps + 1, *shape] noise for the lr (x0) stage."""
    import torch

    torch.manual_seed(seed + save_index)
    draws = [torch.randn(shape)]
    for _ in range(steps):
        draws.append(torch.randn(shape))
    return np.stack([d.numpy() for d in draws]).astype(np.float32)


def reference_hr_noise(seed: int, n_nodes: int, channels: int) -> np.ndarray:
    """[1, n_nodes, channels] initial noise for the hr (eps) stage."""
    import torch

    torch.manual_seed(seed)
    return torch.randn((n_nodes, channels)).numpy()[None].astype(np.float32)


def pad_hr_noise(noise: np.ndarray, g, d: int) -> np.ndarray:
    """Map compact reference-layout noise [S, n_nodes, C] onto the padded
    level-``d`` vertex layout [S, g_cap, C] (leaf segments then current
    nodes — the compact order of `dual_octree.py:400-409`)."""
    spec = g.spec
    fd = spec.full_depth
    s, _, c = noise.shape
    out = np.zeros((s, spec.g_cap(d), c), np.float32)
    pos = 0
    for dd in range(fd, d):
        n = int(g.lnum[dd])
        off = spec.leaf_off(d, dd)
        out[:, off:off + n] = noise[:, pos:pos + n]
        pos += n
    n = int(g.octree.nnum[d])
    out[:, spec.cur_off(d):spec.cur_off(d) + n] = noise[:, pos:pos + n]
    return out
