import os

# Tests must run on a virtual 8-device CPU mesh — not the tunnelled axon TPU
# (each eager op would be a network round-trip).  The container's
# sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so an env override
# alone is not enough; jax.config still honours an update before first use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: CPU compiles dominate suite wall time; repeat
# runs become tracing-only.  A tests-specific directory so TPU artifacts
# (from bench/train) and CPU test artifacts never mix.
from octfusion_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable(
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 ".jax_cache_tests")
)
