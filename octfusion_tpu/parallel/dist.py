"""Multi-host runtime initialization (reference torchrun analogue).

The reference joins a torch.distributed process group from env vars set by
``torchrun`` (`/root/reference/options/base_options.py:106-116`,
``init_method="env://"``).  The TPU-native equivalent is the JAX
multi-controller runtime: every process calls
``jax.distributed.initialize`` against a shared coordinator before any
device query, after which ``jax.devices()`` is the global device list and
jitted collectives ride ICI/DCN.

Opt-in via environment (so single-process runs stay untouched):

    OCTFUSION_COORDINATOR=host:port   coordinator address (all processes)
    OCTFUSION_NUM_PROCESSES=N
    OCTFUSION_PROCESS_ID=i            this process's rank

or ``OCTFUSION_COORDINATOR=auto`` on TPU pods / under cluster launchers
where JAX can auto-detect everything.
"""

from __future__ import annotations

import os


def maybe_initialize() -> bool:
    """Join the multi-controller runtime if the env opts in.

    Must run before the first jax device query.  Returns True when
    ``jax.distributed.initialize`` was called.
    """
    addr = os.environ.get("OCTFUSION_COORDINATOR")
    if not addr:
        return False
    import jax

    if addr == "auto":
        jax.distributed.initialize()
        return True
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["OCTFUSION_NUM_PROCESSES"]),
        process_id=int(os.environ["OCTFUSION_PROCESS_ID"]),
    )
    return True


def global_array_from_local(x, mesh, spec):
    """Assemble a global device array from this process's local shard.

    Single-process: a plain ``device_put`` with the named sharding.
    Multi-process: ``jax.make_array_from_process_local_data`` — each
    process contributes the rows its addressable devices own (the loaders
    are rank-striped, so local data IS the local shard).
    """
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)
