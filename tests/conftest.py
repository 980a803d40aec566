"""Test configuration: run everything on a simulated 8-device CPU mesh.

This is the standard JAX way to exercise multi-device sharding without TPU
hardware (SURVEY.md §4).  Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at import time; the config
# update below wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
