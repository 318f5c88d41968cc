"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated the standard JAX way — with
xla_force_host_platform_device_count — so the full pjit/sharding path compiles
and executes without TPU pod hardware (SURVEY.md §4).

Note: the axon TPU plugin force-registers itself regardless of the
JAX_PLATFORMS env var, so the platform must be overridden through jax.config
before any backend initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
