"""Test configuration: CPU backend with 8 virtual devices.

The reference's device-suite pattern (`test/test_cuda.py`) maps to TPU as:
run the suite on a faked 8-device CPU mesh (SURVEY §4) so multi-chip
sharding logic is exercised without a pod. Must run before jax initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
