"""Persistent XLA compilation cache setup.

The axon TPU path compiles remotely with high and erratic latency
(50-300 s per program observed); the on-disk cache turns repeat runs of
bench/train/entry into tracing-only startups."""

from __future__ import annotations

import os


def enable(cache_dir: str = None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "OCTFUSION_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
