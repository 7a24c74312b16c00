"""Test configuration: force CPU with 8 fake devices (multi-chip sharding
tests run on a virtual mesh, SURVEY.md §4g) and enable float64.

Note: the ambient environment auto-prepends the experimental `axon` TPU
platform to JAX_PLATFORMS at interpreter startup, so the env var alone
cannot deselect it — we set the jax config flag directly, which wins.
"""
import os

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
