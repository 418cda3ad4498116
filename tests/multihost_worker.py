"""Subprocess body for the 2-process multi-host integration test.

Joins the multi-controller runtime via ``dist.maybe_initialize`` (the
env-gated torchrun analogue, `options/base_options.py:106-116`), then
exercises the real multi-host training plumbing on the CPU backend:

* rank-striped ``InfiniteSampler`` index streams (loader sharding),
* ``shard_batch``/``global_array_from_local`` assembly of a global batch
  from per-process rows,
* a ``make_vae_dp_train_step``-built shard_map step whose pmean must ride
  the cross-process collective for ranks to stay in sync.

Writes a JSON result file the parent asserts on.
"""

import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    out_path = sys.argv[2]

    import jax

    # the container's sitecustomize pre-imports jax on the axon platform;
    # force CPU before the runtime spins up (same dance as tests/conftest)
    jax.config.update("jax_platforms", "cpu")

    from octfusion_tpu.parallel import dist

    assert dist.maybe_initialize(), "env opt-in missing"
    assert jax.process_count() == 2
    assert jax.process_index() == rank
    assert jax.device_count() == 4
    assert jax.local_device_count() == 2

    import numpy as np
    import jax.numpy as jnp
    import optax

    from octfusion_tpu.data.loader import InfiniteSampler
    from octfusion_tpu.models.common import TrainState
    from octfusion_tpu.parallel import train_step as pts
    from octfusion_tpu.parallel.mesh import make_mesh

    # ---- loader striping ------------------------------------------------
    sampler = InfiniteSampler(8, shuffle=True, seed=7, rank=rank,
                              world_size=2)
    it = iter(sampler)
    indices = [next(it) for _ in range(8)]  # two epochs' worth per rank

    # ---- DP step over the global 4-device mesh --------------------------
    class ToySolver:
        def make_optimizer(self, total_steps):
            return optax.sgd(0.1)

        def loss_fn(self, params, batch, key):
            pred = (batch["pos"] * params["w"]).sum(-1)
            loss = jnp.mean((pred - batch["sdf"]) ** 2)
            loss = loss + 0.0 * batch["points"].sum()
            return loss, {"loss": loss}

    mesh = make_mesh(data=4, model=1)
    step_fn = pts.make_vae_dp_train_step(ToySolver(), mesh, total_steps=10)

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"w": jnp.asarray(np.zeros(3, np.float32))},
        opt_state=optax.sgd(0.1).init({"w": jnp.zeros(3, jnp.float32)}),
    )
    # deterministic global batch: rows 2*rank, 2*rank+1 of np.arange fills
    B_local, M = 2, 4
    rows = np.arange(2 * rank, 2 * rank + B_local)
    local = {
        "points": np.ones((B_local, 2, 3), np.float32),
        "normals": np.ones((B_local, 2, 3), np.float32),
        "label": rows.astype(np.int32),
        "pos": (rows[:, None, None]
                + 0.1 * np.arange(M)[None, :, None]
                + 0.01 * np.arange(3)[None, None, :]).astype(np.float32),
        "sdf": (0.5 * rows[:, None] + 0.05 * np.arange(M)[None, :]).astype(
            np.float32),
        "grad": np.zeros((B_local, M, 3), np.float32),
    }
    for _ in range(3):
        sb = pts.shard_batch(local, mesh, vae=True)
        state, ld = step_fn(state, sb, jax.random.PRNGKey(0))

    result = {
        "rank": rank,
        "indices": [int(i) for i in indices],
        "w": np.asarray(state.params["w"]).tolist(),
        "loss": float(ld["loss"]),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
