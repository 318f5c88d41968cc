"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated the standard JAX way — with
xla_force_host_platform_device_count — so the full pjit/sharding path compiles
and executes without TPU pod hardware (SURVEY.md §4). Must run before jax
initializes its backends, hence module scope in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
