"""Test configuration: run JAX on CPU with 8 virtual devices and 64-bit floats.

Accuracy parity with the f64 Julia reference requires x64; sharding tests use
the virtual CPU mesh (real multi-chip TPU hardware is exercised separately by
the driver's dryrun).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host env exports axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone can be overridden by the host's axon TPU plugin at
# import; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from homogenization_jl_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
