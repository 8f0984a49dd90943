"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference repo has no portable test suite (everything needs a CUDA GPU —
see SURVEY.md §4). Here all numeric ops are pure JAX, so the full suite runs
on CPU; multi-chip sharding tests use 8 virtual CPU devices.
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
