"""Diagonal Gaussian posterior helpers
(`/root/reference/models/networks/dualoctree_networks/distributions.py`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_params(params: jnp.ndarray):
    """params [N, 2C] -> (mean, logvar) with logvar clamped to [-30, 20]."""
    mean, logvar = jnp.split(params, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample(key, mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def kl(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Elementwise KL to N(0, I) (`distributions.py:47`)."""
    return 0.5 * (mean**2 + jnp.exp(logvar) - 1.0 - logvar)


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + (mean1 - mean2) ** 2 * jnp.exp(-logvar2)
    )
