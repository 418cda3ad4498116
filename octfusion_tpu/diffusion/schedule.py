"""Continuous-time log-SNR diffusion schedules
(`/root/reference/models/networks/diffusion_networks/ldm_diffusion_util.py:289-316`)."""

from __future__ import annotations

import math

import jax.numpy as jnp


def beta_linear_log_snr(t):
    return -jnp.log(jnp.expm1(1e-4 + 10.0 * (t**2)))


def alpha_cosine_log_snr(t, s: float = 0.008):
    c = jnp.cos((t + s) / (1 + s) * math.pi * 0.5)
    return -jnp.log(jnp.clip(c**-2 - 1.0, min=1e-5))


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def log_snr_to_alpha_sigma(log_snr):
    return jnp.sqrt(_sigmoid(log_snr)), jnp.sqrt(_sigmoid(-log_snr))


def get_log_snr(name: str):
    if name == "linear":
        return beta_linear_log_snr
    if name == "cosine":
        return alpha_cosine_log_snr
    raise ValueError(f"unknown noise schedule {name}")


def sampling_time_pairs(steps: int):
    """[(t, t_next)] as two [steps] arrays, t from 1 -> 0
    (`octfusion_model_union.py:293-298`)."""
    times = jnp.linspace(1.0, 0.0, steps + 1)
    return times[:-1], times[1:]
