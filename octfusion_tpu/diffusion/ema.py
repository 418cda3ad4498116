"""Exponential moving average of parameters
(`/root/reference/models/networks/diffusion_networks/ldm_diffusion_util.py:35-53`)."""

from __future__ import annotations

import jax


def ema_update(ema_params, params, beta: float = 0.999):
    return jax.tree_util.tree_map(
        lambda e, p: e * beta + (1.0 - beta) * p, ema_params, params
    )
