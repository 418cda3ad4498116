"""Compare SDF-grid evaluators on the current backend (run on real TPU).

    python benchmarks/bench_sdf_grid.py [size] [finest_cap]

Times the dense-resampling path (`ops/mpu.mpu_grid_eval`) against the
hierarchical gather path that round 1 shipped.
"""

import sys
import time

import numpy as np


def sync(x):
    import jax

    # block_until_ready does not synchronise through the axon tunnel;
    # force a 1-element D2H instead (PERF.md)
    return np.asarray(x.reshape(-1)[0])


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    import jax
    import jax.numpy as jnp

    from octfusion_tpu.utils import jaxcache

    jaxcache.enable()
    from octfusion_tpu.octree.octree import OctreeSpec, build_octree
    from octfusion_tpu.utils import sdf as sdf_utils

    depth, fd = 8, 4
    spec = OctreeSpec.create(depth, fd, 1, finest_cap_per_sample=cap)
    rng = np.random.RandomState(0)
    v = rng.normal(size=(65536, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    o = jax.jit(build_octree, static_argnames=("spec",))(
        jnp.asarray((0.6 * v).astype(np.float32)),
        jnp.asarray(v.astype(np.float32)), spec,
    )
    reg = {
        dd: jnp.asarray(
            rng.normal(size=(spec.node_caps[dd], 4)).astype(np.float32)
        )
        for dd in range(fd, depth + 1)
    }
    print(f"devices={jax.devices()} size={size} caps={spec.node_caps}")

    def run_dense():
        out = sdf_utils._sdf_grid_dense(
            reg, o, fd, depth, size, jnp.float32(-0.9), jnp.float32(0.9)
        )
        sync(out)
        return out

    t0 = time.time()
    run_dense()
    print(f"dense compile+run: {time.time() - t0:.2f}s")
    ts = []
    for _ in range(5):
        t0 = time.time()
        run_dense()
        ts.append(time.time() - t0)
    print(f"dense warm: {np.median(ts) * 1e3:.1f} ms (runs: "
          f"{[round(t * 1e3, 1) for t in ts]})")

    def run_hier():
        c, vals = sdf_utils._sdf_grid_hier_packed(
            reg, o, fd, depth, size, jnp.float32(-0.9), jnp.float32(0.9),
            64**3, 1,
        )
        sync(vals)

    t0 = time.time()
    run_hier()
    print(f"hier-gather compile+run: {time.time() - t0:.2f}s")
    ts = []
    for _ in range(3):
        t0 = time.time()
        run_hier()
        ts.append(time.time() - t0)
    print(f"hier-gather warm: {np.median(ts) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
