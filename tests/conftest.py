"""Test configuration: CPU backend with 8 virtual devices, float64 on.

Multi-chip sharding is validated on a simulated CPU mesh
(xla_force_host_platform_device_count), the standard way to test
pjit/shard_map without a pod.

Note: this environment's sitecustomize registers a remote TPU backend
and forces jax_platforms="axon,cpu"; we override the config *after*
import (JAX backends initialize lazily, so this still wins) to keep the
test suite fast, deterministic, and float64-capable.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
