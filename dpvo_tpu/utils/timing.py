"""Timing utilities (ref dpvo/utils.py:8-29 Timer with CUDA events).

TPU equivalent: ``block_until_ready`` fences around wall-clock timing,
plus a jax.profiler trace helper for deeper analysis.
"""
from __future__ import annotations

import time
from contextlib import ContextDecorator

import jax

all_times = []


class Timer(ContextDecorator):
    """Wall-clock section timer that fences outstanding device work."""

    def __init__(self, name, enabled=True):
        self.name = name
        self.enabled = enabled

    def __enter__(self):
        if self.enabled:
            jax.block_until_ready(jax.device_put(0))  # drain queue
            self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            jax.block_until_ready(jax.device_put(0))
            elapsed = (time.perf_counter() - self.start) * 1000.0
            all_times.append(elapsed)
            print(f"{self.name} {elapsed:.03f}")
        return False


class profile_trace:
    """jax.profiler trace context: view with TensorBoard or xprof."""

    def __init__(self, logdir="/tmp/dpvo_tpu_trace"):
        self.logdir = logdir

    def __enter__(self):
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False


def benchmark(fn, *args, warmup=3, iters=10):
    """Simple op benchmark with warmup (ref benchmark_dataloader.CUDATimer
    analogue). Returns median milliseconds."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1000.0)
    times.sort()
    return times[len(times) // 2]
