"""Test harness config: run everything on a virtual 8-device CPU mesh.

XLA_FLAGS must be set before jax initialises its backends; the axon TPU
plugin ignores JAX_PLATFORMS, so we force CPU via jax.config instead
(SURVEY.md §4e).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
