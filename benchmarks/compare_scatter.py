#!/usr/bin/env python
"""Scatter-op correctness + timing at DPVO-realistic shapes
(ref dpvo/test/compare_scatter.py: DIM 384, M 80/1024, edges 1280/8192).

Validates dpvo_tpu.ops.scatter against dense numpy references and times
each op with proper device fences.
"""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.ops import scatter
from dpvo_tpu.utils.timing import benchmark

DIM = 384
CONFIGS = [
    ("inference", 1280, 80 * 16),
    ("training", 8192, 1024),
]


def dense_softmax(src, idx, S):
    out = np.zeros_like(src)
    for g in np.unique(idx):
        m = idx == g
        e = np.exp(src[m] - src[m].max(axis=0))
        out[m] = e / e.sum(axis=0)
    return out


def main():
    print(f"backend: {jax.default_backend()}")
    for name, E, S in CONFIGS:
        key = jax.random.PRNGKey(0)
        src = jax.random.normal(key, (E, DIM))
        idx = jax.random.randint(jax.random.PRNGKey(1), (E,), 0, S)

        # correctness
        out = np.asarray(scatter.scatter_softmax(src, idx, S))
        ref = dense_softmax(np.asarray(src), np.asarray(idx), S)
        err = np.abs(out - ref).max()
        assert err < 1e-5, err

        fns = {
            "scatter_sum": lambda: scatter.scatter_sum(src, idx, S),
            "scatter_softmax": lambda: scatter.scatter_softmax(src, idx, S),
            "scatter_mean": lambda: scatter.scatter_mean(src, idx, S),
            "scatter_max": lambda: scatter.scatter_max(src, idx, S),
        }
        for fname, fn in fns.items():
            jfn = jax.jit(fn)
            ms = benchmark(jfn, warmup=2, iters=10)
            print(f"{name:10s} E={E:5d} S={S:5d} {fname:16s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()
