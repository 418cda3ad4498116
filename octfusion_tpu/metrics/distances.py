"""Point-cloud distances on TPU: Chamfer and approximate EMD.

TPU-native counterparts of the reference's CUDA kernels
(`/root/reference/metrics/pytorch_structural_losses/src/nndistance.cu`,
``approxmatch.cu``):

* ``chamfer`` — blocked brute-force pairwise min-distance (the [N, M] cost
  matrix is dense matmul-shaped work the MXU eats directly; blocking keeps
  it in VMEM-sized tiles via XLA);
* ``emd_approx`` — the same auction-style approximate matching as the CUDA
  kernel: 9 rounds of exponentially sharpening soft assignment with
  remaining-mass multipliers (`approxmatch.cu:3-182`), expressed as dense
  [N, M] tensor ops.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp


def _pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,3] x [M,3] -> [N,M] squared distances via the matmul expansion."""
    aa = jnp.sum(a * a, -1, keepdims=True)
    bb = jnp.sum(b * b, -1, keepdims=True)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(aa - 2.0 * ab + bb.T, 0.0)


@jax.jit
def chamfer(a: jnp.ndarray, b: jnp.ndarray):
    """Bidirectional squared Chamfer terms for a batch:
    a [B,N,3], b [B,M,3] -> (dl [B,N], dr [B,M]) like the reference's
    ``distChamfer`` (`metrics/evaluation_metrics.py:11-22`)."""
    d = jax.vmap(_pairwise_sqdist)(a, b)
    return jnp.min(d, axis=2), jnp.min(d, axis=1)


@partial(jax.jit, static_argnames=("rounds", "store_dtype"))
def emd_approx(a: jnp.ndarray, b: jnp.ndarray, rounds: int = 9,
               store_dtype=jnp.float32):
    """Auction-style approximate EMD matching cost, batched.

    a [B,N,3], b [B,M,3] -> [B] mean matched distance.  Mirrors the CUDA
    ``approxmatch`` loop with the EXACT reference level schedule
    (`approxmatch.cu:24-28`): j = 7..-1, level = -4^j (final level
    -0.25; the reference's j==-2/level=0 branch is dead code), weights =
    exp(level * d^2) scaled by remaining row/col mass, normalised twice,
    accumulated into a soft match.

    ``store_dtype`` controls the element type of the two [N, M] matrices
    that live across rounds (d^2 and the accumulated match).  The auction
    is HBM-bandwidth bound at eval scale — each of the 9 rounds streams
    both matrices several times — so ``jnp.bfloat16`` halves the traffic;
    all reductions and the remaining-mass carries stay fp32 (weights are
    recomputed from d^2 in fp32 inside each fused pass).  The bf16 cost
    differs from fp32 by <0.2% relative on random clouds, far below the
    ~2% algorithmic gap of approxmatch itself vs exact EMD."""

    def one(x, y):
        n, m = x.shape[0], y.shape[0]
        d2 = _pairwise_sqdist(x, y).astype(store_dtype)
        match = jnp.zeros((n, m), store_dtype)
        remain_r = jnp.ones((n,), jnp.float32) * (m / n)
        remain_c = jnp.ones((m,), jnp.float32)

        def body(carry, level):
            match, remain_r, remain_c = carry
            w = jnp.exp(level * d2.astype(jnp.float32))
            w = w * remain_r[:, None]
            # normalise columns by demand, rows by supply
            col = jnp.sum(w, axis=0, keepdims=True)
            w = w * (remain_c / jnp.maximum(col, 1e-9))[0][None, :]
            row = jnp.sum(w, axis=1, keepdims=True)
            ratio = jnp.minimum(remain_r[:, None] / jnp.maximum(row, 1e-9), 1.0)
            w = w * ratio
            match = (match.astype(jnp.float32) + w).astype(store_dtype)
            remain_r = jnp.maximum(remain_r - jnp.sum(w, axis=1), 0.0)
            remain_c = jnp.maximum(remain_c - jnp.sum(w, axis=0), 0.0)
            return (match, remain_r, remain_c), None

        levels = jnp.array(
            [-(4.0**j) for j in range(rounds - 2, -2, -1)],
            jnp.float32,
        )
        (match, _, _), _ = jax.lax.scan(
            body, (match, remain_r, remain_c), levels
        )
        cost = jnp.sum(
            match.astype(jnp.float32) * jnp.sqrt(d2.astype(jnp.float32))
        )
        return cost / m

    return jax.vmap(one)(a, b)


def pairwise_cd_emd(
    sample: jnp.ndarray,
    ref: jnp.ndarray,
    batch: int = 16,
    emd: bool = True,
    row_block: int = 4,
    emd_store_dtype=jnp.float32,
    shard_devices=None,
    progress: str = None,
):
    """All-pairs Chamfer (+EMD) matrices between two point-cloud sets
    (`metrics/evaluation_metrics.py:111-154`): sample [S,P,3], ref [R,P,3]
    -> (cd [S,R], emd [S,R]).

    Blocked over BOTH sets: each jitted call evaluates a
    [row_block x batch] tile of pairs (flattened into one vmap batch), so
    the dispatch count is S*R/(row_block*batch) — at eval-set scale
    (3*S^2 pairs, S = 2831-5956, `utils/util.py:19`) per-call dispatch
    latency through the tunnelled device otherwise dominates.  Peak
    device memory is ~3 matrices of [row_block*batch, P, P] floats (EMD
    holds d2 + weights + match), so keep row_block*batch <= ~64 at
    P = 2048 on a 16 GB chip.

    ``shard_devices``: a list of JAX devices (or ``"auto"`` for all local
    devices) to SHARD the pair grid over — the distance matrix is
    embarrassingly parallel, so each tile's row block is split across a
    1-D ``jax.sharding.Mesh`` (rows sharded, columns replicated) and the
    per-pair programs run with zero collectives; wall time divides by the
    device count (the reference's eval is single-GPU,
    `evaluation_metrics.py:111-154`).  Every device computes
    ``row_block`` rows of each tile, so the effective tile is
    ``[n_dev*row_block, batch]`` pairs and per-device memory matches the
    single-device bound above."""
    import numpy as np

    if shard_devices == "auto":
        shard_devices = jax.local_devices()
        if len(shard_devices) == 1:
            shard_devices = None
    if shard_devices is not None:
        return _pairwise_cd_emd_sharded(
            sample, ref, tuple(shard_devices), batch, emd, row_block,
            emd_store_dtype, progress=progress)

    s = sample.shape[0]
    r = ref.shape[0]
    cd = np.zeros((s, r), np.float32)
    em = np.zeros((s, r), np.float32)

    beat = _heartbeat(progress)
    tile = _tile_fn(bool(emd), jnp.dtype(emd_store_dtype).name)

    def pad_to(x, n):
        if x.shape[0] == n:
            return x
        reps = jnp.broadcast_to(
            x[-1:], (n - x.shape[0],) + x.shape[1:]
        )
        return jnp.concatenate([x, reps], 0)

    for i0 in range(0, s, row_block):
        i1 = min(i0 + row_block, s)
        rows = pad_to(sample[i0:i1], row_block)
        for j0 in range(0, r, batch):
            j1 = min(j0 + batch, r)
            cols = pad_to(ref[j0:j1], batch)
            cdv, emv = tile(rows, cols)
            cd[i0:i1, j0:j1] = np.asarray(cdv)[: i1 - i0, : j1 - j0]
            em[i0:i1, j0:j1] = np.asarray(emv)[: i1 - i0, : j1 - j0]
        beat(i1 * r, s * r)
    return cd, em


def _heartbeat(progress):
    """Time-throttled stderr progress line — an eval tile grid runs for
    tens of minutes with no output otherwise, which is indistinguishable
    from a wedged device transport."""
    import sys
    import time as _time

    state = {"last": _time.time(), "start": _time.time()}

    def beat(done, total):
        if progress and _time.time() - state["last"] > 30:
            state["last"] = _time.time()
            rate = done / max(state["last"] - state["start"], 1e-9)
            sys.stderr.write(
                f"[pairwise {progress}] {done}/{total} pairs "
                f"({100 * done / total:.0f}%, {rate:.0f} pairs/s, "
                f"eta {(total - done) / max(rate, 1e-9):.0f}s)\n")
            sys.stderr.flush()

    return beat


# The jitted tile programs are cached at module level (keyed on the knobs
# that change the traced program) — a per-call closure would re-trace the
# same program on each of the three per-eval invocations (advisor r4).
@functools.lru_cache(maxsize=8)
def _tile_fn(emd: bool, store_dtype_name: str):
    store_dtype = jnp.dtype(store_dtype_name)

    @jax.jit
    def tile(ss, rr):
        rb, cb = ss.shape[0], rr.shape[0]
        a = jnp.broadcast_to(ss[:, None], (rb, cb) + ss.shape[1:])
        b = jnp.broadcast_to(rr[None], (rb, cb) + rr.shape[1:])
        a = a.reshape((rb * cb,) + ss.shape[1:])
        b = b.reshape((rb * cb,) + rr.shape[1:])
        dl, dr = chamfer(a, b)
        cdv = dl.mean(-1) + dr.mean(-1)
        emv = (emd_approx(a, b, store_dtype=store_dtype).astype(
            jnp.float32) if emd else jnp.zeros((rb * cb,)))
        return cdv.reshape(rb, cb), emv.reshape(rb, cb)

    return tile


@functools.lru_cache(maxsize=8)
def _sharded_tile_fn(devices: tuple, emd: bool, store_dtype_name: str):
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    store_dtype = jnp.dtype(store_dtype_name)
    mesh = Mesh(np.asarray(devices), ("eval",))
    row_sh = NamedSharding(mesh, P("eval"))
    rep_sh = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(row_sh, row_sh))
    def tile(ss, rr):
        def one_row(s1):
            a = jnp.broadcast_to(s1[None], (rr.shape[0],) + s1.shape)
            dl, dr = chamfer(a, rr)
            cdv = dl.mean(-1) + dr.mean(-1)
            emv = (emd_approx(a, rr, store_dtype=store_dtype).astype(
                jnp.float32) if emd else jnp.zeros((rr.shape[0],)))
            return cdv, emv

        return jax.vmap(one_row)(ss)

    return tile, row_sh, rep_sh


def _pairwise_cd_emd_sharded(sample, ref, devices, batch, emd, row_block,
                             emd_store_dtype, progress=None):
    """Device-sharded tile loop of :func:`pairwise_cd_emd`.

    The [n_dev*row_block, batch] tile keeps rows on a 1-D mesh axis and
    replicates the column block; the nested vmap (rows outer, columns
    inner) leaves the row axis as the partitioned dimension, so XLA splits
    the tile into n_dev independent per-device programs — no collectives,
    linear scaling.  Per-pair numerics are identical to the single-device
    path (same chamfer/emd_approx programs under the vmaps)."""
    import numpy as np

    n_dev = len(devices)
    rb = n_dev * row_block
    tile, row_sh, rep_sh = _sharded_tile_fn(
        tuple(devices), bool(emd), jnp.dtype(emd_store_dtype).name)
    beat = _heartbeat(progress)

    s, r = sample.shape[0], ref.shape[0]
    cd = np.zeros((s, r), np.float32)
    em = np.zeros((s, r), np.float32)

    def pad_to(x, n):
        if x.shape[0] == n:
            return x
        reps = jnp.broadcast_to(x[-1:], (n - x.shape[0],) + x.shape[1:])
        return jnp.concatenate([x, reps], 0)

    for i0 in range(0, s, rb):
        i1 = min(i0 + rb, s)
        rows = jax.device_put(pad_to(sample[i0:i1], rb), row_sh)
        for j0 in range(0, r, batch):
            j1 = min(j0 + batch, r)
            cols = jax.device_put(pad_to(ref[j0:j1], batch), rep_sh)
            cdv, emv = tile(rows, cols)
            cd[i0:i1, j0:j1] = np.asarray(cdv)[: i1 - i0, : j1 - j0]
            em[i0:i1, j0:j1] = np.asarray(emv)[: i1 - i0, : j1 - j0]
        beat(i1 * r, s * r)
    return cd, em
