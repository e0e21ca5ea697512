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

# Interpret-mode kernel compiles dominate the suite's wall-clock, and
# the kernel body unrolls MAX_STAGE_BLOCK stage bodies per grid step —
# pure scheduling with no math effect.  Pin it to 1 here (~8x less code
# to trace/compile per kernel); test_multi_stage_grid_blocks restores
# it to cover the blocked path, and the on-device gate (bench.py
# --check) runs the T-enabled kernels on real hardware.
from pdp_lqr_tpu.ops import pallas_riccati as _pr

_pr.MAX_STAGE_BLOCK = 1
