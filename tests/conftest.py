"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference repo has no portable test suite (everything needs a CUDA GPU —
see SURVEY.md §4). Here all numeric ops are pure JAX, so the full suite runs
on CPU; multi-chip sharding tests use 8 virtual CPU devices.
"""
import os

# NOTE: the environment ships with JAX_PLATFORMS=axon (a remote TPU
# backend) and ALL compiles — cpu included — route through its serialized
# remote compile service.  Forcing cpu here would recompile the entire
# suite into a cold cache for no isolation benefit, so tests run on
# whatever platform the environment provides; test configs pin
# CORR_BACKEND="xla" so the Mosaic kernel is exercised only by its
# dedicated interpret-mode tests (test_corr_pallas.py) and on-TPU checks.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
