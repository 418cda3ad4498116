"""Branch-free vectorised binary searches.

The reference packs (batch, morton, depth) into 64-bit keys and relies on
``torch.searchsorted`` (`mpu.py:69-70`, `modules.py:771`).  JAX on TPU is
32-bit by default, so we search over *pairs* of int32 arrays compared
lexicographically instead of enabling x64 globally.
"""

from __future__ import annotations

import jax.numpy as jnp


def _ceil_log2(n: int) -> int:
    k = 0
    while (1 << k) < n:
        k += 1
    return k


def searchsorted_int(sorted_arr: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Left-insertion index of each query into an ascending int array."""
    return jnp.searchsorted(sorted_arr, queries, side="left").astype(jnp.int32)


def searchsorted_pair(
    hi: jnp.ndarray,
    lo: jnp.ndarray,
    qhi: jnp.ndarray,
    qlo: jnp.ndarray,
) -> jnp.ndarray:
    """Left-insertion index of (qhi, qlo) into the lexicographically
    ascending pair sequence (hi, lo).  All int32; fully vectorised, unrolled
    ``ceil(log2(n))`` steps of gather+compare."""
    n = hi.shape[0]
    steps = _ceil_log2(n + 1)
    lo_b = jnp.zeros(qhi.shape, jnp.int32)
    hi_b = jnp.full(qhi.shape, n, jnp.int32)
    for _ in range(steps):
        active = lo_b < hi_b
        mid = (lo_b + hi_b) >> 1
        mid_c = jnp.clip(mid, 0, n - 1)
        mh = hi[mid_c]
        ml = lo[mid_c]
        # arr[mid] < query ?
        less = (mh < qhi) | ((mh == qhi) & (ml < qlo))
        lo_b = jnp.where(active & less, mid + 1, lo_b)
        hi_b = jnp.where(active & ~less, mid, hi_b)
    return lo_b
