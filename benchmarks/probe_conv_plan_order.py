"""Descriptor-count probes for the fused-conv plan (round-3, both REJECTED).

Counts real descriptors produced by ``graph_conv_plan._make_descs`` on a
realistic shape under (a) the current depth-segment vertex order vs a
Morton-interleaved spatial permutation, and (b) with intra-8-block sibling
edges removed (the dense-einsum extraction hypothesis).  Both measured
~1.0x — see PERF.md "Round-3 probes" for the numbers and the floor
analysis.  Runs on CPU.

    python benchmarks/probe_conv_plan_order.py [finest_cap]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from octfusion_tpu.config import CapacityConfig
from octfusion_tpu.models.common import batch_to_graph_jit
from octfusion_tpu.octree import morton
from octfusion_tpu.ops.pallas.graph_conv_plan import _make_descs, TILE


def count_real(r_, c_, d_, s_, valid, gcap, t):
    r_tiles = -(-gcap // t)
    d_cap = r_tiles * 512  # oversized: the probe must never overflow
    out = _make_descs(jnp.asarray(r_), jnp.asarray(c_), jnp.asarray(d_),
                      jnp.asarray(s_), jnp.asarray(valid), gcap, t,
                      r_tiles, d_cap)
    return int(out[6])


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    spec = CapacityConfig(finest_cap=cap).octree_spec(8, 4, 1)
    rng = np.random.RandomState(0)
    v = rng.normal(size=(32768, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = 0.6 + 0.15 * np.sin(5 * v[:, 0]) * np.cos(4 * v[:, 1])
    _, g = batch_to_graph_jit(
        jnp.asarray((r[:, None] * v).astype(np.float32))[None],
        jnp.asarray(v.astype(np.float32))[None], spec, 9, up_to=6,
    )

    for d in (6, 5, 4):
        lvl = g.level(d)
        gcap = lvl.g_cap
        r_ = np.asarray(lvl.edge_row)
        c_ = np.asarray(lvl.edge_col)
        dd_ = np.asarray(lvl.edge_dir)
        s_ = np.asarray(lvl.edge_scale)
        valid = r_ < gcap
        n0 = count_real(r_, c_, dd_, s_, valid, gcap, TILE)

        # (a) Morton-interleaved spatial permutation
        ndv = np.asarray(lvl.node_depthv)
        nsl = np.asarray(lvl.node_slot)
        nb = np.asarray(lvl.node_batch)
        nm = np.asarray(lvl.node_mask)
        key = np.zeros(gcap, np.int64)
        for depth in range(spec.full_depth, d + 1):
            m = nm & (ndv == depth)
            if not m.any():
                continue
            x, y, z, _ = (np.asarray(a) for a in g.octree.xyzb(depth))
            sl = nsl[m]
            sh = d - depth
            key[m] = np.asarray(morton.xyz2key(
                jnp.asarray(x[sl] << sh), jnp.asarray(y[sl] << sh),
                jnp.asarray(z[sl] << sh), d)).astype(np.int64)
        sortk = np.where(nm, nb.astype(np.int64) * (8 ** d) + key, 2**62)
        perm = np.argsort(sortk, kind="stable")
        pos = np.empty(gcap, np.int64)
        pos[perm] = np.arange(gcap)
        pr = np.where(valid, pos[np.clip(r_, 0, gcap - 1)], gcap)
        pc = np.where(valid, pos[np.clip(c_, 0, gcap - 1)], gcap)
        n1 = count_real(pr.astype(np.int32), pc.astype(np.int32), dd_, s_,
                        valid, gcap, TILE)

        # (b) sibling-edge removal
        cur_off = lvl.spec.cur_off(d)
        sib = (valid & (r_ >= cur_off) & (c_ >= cur_off)
               & ((r_ - cur_off) // 8 == (c_ - cur_off) // 8) & (dd_ < 6)
               & (s_ == 1.0))
        v2 = valid & ~sib
        n2 = count_real(np.where(v2, r_, gcap).astype(np.int32),
                        np.where(v2, c_, gcap).astype(np.int32),
                        dd_, s_, v2, gcap, TILE)
        print(f"level {d}: g_cap={gcap} edges={int(valid.sum())} "
              f"descs={n0}  morton-perm={n1} ({n0 / max(n1, 1):.2f}x)  "
              f"sans-sibling={n2} ({(1 - n2 / n0) * 100:.0f}% fewer, "
              f"{int(sib.sum())} sibling edges)")


if __name__ == "__main__":
    main()
