"""Morton (Z-order) key math, int32-safe.

Key layout matches the per-bit interleaving the reference relies on
(`/root/reference/models/networks/dualoctree_networks/dual_octree.py:129-138`
treats ``arange(8**d)`` as the keys of a full octree level): for every bit
level ``i`` the bits of ``(x, y, z)`` occupy positions ``(3i+2, 3i+1, 3i)``,
i.e. ``x`` is the most significant of each triplet.

Unlike the reference (48-bit keys + batch index in bits 48+, which forces
int64 everywhere), we keep Morton codes in int32 — depth <= 10 needs only 30
bits — and carry the batch index as a separate int32 array.  Lexicographic
``(batch, key)`` order replaces the packed 64-bit order; see
:func:`searchsorted_pair` in ``octfusion_tpu/ops/search.py``.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_DEPTH = 10
# Sentinel for padded (invalid) key slots: sorts after every valid key.
INVALID_KEY = jnp.iinfo(jnp.int32).max


def _part_bits(v: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Spread the low `depth` (<=10) bits of v so bit i moves to bit 3*i.

    Magic-number spreading: 4 shift/mask steps independent of depth (the
    per-bit loop was the dominant HBM traffic of MPU grid evaluation)."""
    del depth
    v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
    v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return v


def _compact_bits(code: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Inverse of _part_bits (magic-number gathering)."""
    del depth
    v = code.astype(jnp.uint32) & jnp.uint32(0x09249249)
    v = (v | (v >> jnp.uint32(2))) & jnp.uint32(0x030C30C3)
    v = (v | (v >> jnp.uint32(4))) & jnp.uint32(0x0300F00F)
    v = (v | (v >> jnp.uint32(8))) & jnp.uint32(0x030000FF)
    v = (v | (v >> jnp.uint32(16))) & jnp.uint32(0x000003FF)
    return v


def xyz2key(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Interleave integer coordinates into a Morton key at `depth`.

    Bit of x at level i lands at position 3i+2, y at 3i+1, z at 3i.
    """
    assert depth <= MAX_DEPTH
    key = (
        (_part_bits(x, depth) << jnp.uint32(2))
        | (_part_bits(y, depth) << jnp.uint32(1))
        | _part_bits(z, depth)
    )
    return key.astype(jnp.int32)


def key2xyz(key: jnp.ndarray, depth: int):
    """Decode a Morton key at `depth` into (x, y, z) int32 coordinates."""
    assert depth <= MAX_DEPTH
    k = key.astype(jnp.uint32)
    x = _compact_bits(k >> jnp.uint32(2), depth)
    y = _compact_bits(k >> jnp.uint32(1), depth)
    z = _compact_bits(k, depth)
    return x.astype(jnp.int32), y.astype(jnp.int32), z.astype(jnp.int32)
