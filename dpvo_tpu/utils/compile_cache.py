"""Persistent XLA compilation cache setup.

The engine's bucketed static shapes compile to a few dozen XLA programs;
on backends with a remote/serialized compiler (e.g. a tunneled TPU) a
cold process pays minutes of compile time before the first tracked
frame.  JAX's persistent compilation cache removes that cost across
processes (measured here: 9.4 s -> 0.05 s for a re-used program).
``dpvo_tpu/__init__.py`` calls :func:`enable_persistent_cache` at import
time, so every entry point opts in by default.

Env override:
  DPVO_TPU_CACHE_DIR   cache directory ("" or "0" disables)
  (default: ~/.cache/dpvo_tpu_xla)
"""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache directory.

    Call BEFORE the first jit dispatch (safe anytime; earlier catches
    more programs).  Returns the directory used, or None when disabled.
    """
    import jax

    if path is None:
        path = os.environ.get("DPVO_TPU_CACHE_DIR")
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "dpvo_tpu_xla")
    if path in ("", "0", "off", "none"):
        return None
    # CPU AOT cache entries bake host machine features; reloading them on
    # a different host (or after a toolchain change) warns about SIGILL
    # risk.  CPU compiles are fast — only cache for accelerator backends.
    # Decide from the RESOLVED platform config, not just the env var:
    # tests select CPU via jax.config.update("jax_platforms", "cpu").
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", "")).strip().lower()
    if platforms == "cpu":
        return None
    if not platforms:
        # no explicit selection: ask the resolved backend (initializes
        # the backend, which is fine — caching applies to later jits)
        try:
            if jax.default_backend() == "cpu":
                return None
        except Exception:
            return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # only cache programs that took real compile time; sub-second
    # programs recompile faster than a remote round trip anyway
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
