"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference repo has no portable test suite (everything needs a CUDA GPU —
see SURVEY.md §4). Here all numeric ops are pure JAX, so the full suite runs
on CPU; multi-chip sharding tests use 8 virtual CPU devices.
"""
import os

# NOTE: the environment's sitecustomize (.axon_site on PYTHONPATH)
# overrides jax_platforms to "axon,cpu", so a JAX_PLATFORMS env default
# is silently ignored and the suite would run against the ONE remote
# TPU chip — slow (every dispatch rides a tunnel), contended (bench
# runs share the chip), and wrong for mesh tests (make_mesh(8) needs 8
# devices).  jax.config.update AFTER import wins over the
# sitecustomize; the multi-chip tests then see 8 virtual CPU devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
