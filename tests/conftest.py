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

# XLA:CPU AOT cache loads log a scary-but-benign machine-feature E-line
# per cached program (the diff is the prefer-no-scatter/gather TUNING
# pseudo-features, not real ISA bits); at 150 tests that's thousands of
# log lines, so keep only FATAL from the C++ side.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

# Persistent compilation cache for the CPU test suite.  The package
# default (dpvo_tpu.utils.compile_cache) skips CPU because AOT entries
# bake host machine features and must not travel between hosts — but the
# test cache lives and dies on THIS vm, where reuse is safe and saves
# ~80% of the suite's wall time (the 1-core vm pays 10-40 s of XLA:CPU
# compile per engine-scale program; measured 14.2 s -> 2.8 s on a cache
# hit for ba_iterative at E=4096).
_cache = os.environ.get("DPVO_TEST_CACHE_DIR",
                        os.path.expanduser("~/.cache/dpvo_tpu_xla_cpu"))
if _cache not in ("", "0", "off"):
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
