import os
import sys

# Force a deterministic 8-device virtual CPU mesh for all tests so the
# multi-chip sharding paths are exercised without TPU hardware.
#
# The image's sitecustomize pre-imports jax and registers the axon TPU
# backend with JAX_PLATFORMS=axon, so plain env vars are latched too late;
# override through jax.config instead (backends initialize lazily, so the
# XLA_FLAGS update below is still honored by the CPU client).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
