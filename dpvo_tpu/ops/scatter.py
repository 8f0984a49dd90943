"""Segment/scatter ops (pure JAX).

Replaces the reference's native-PyTorch torch_scatter reimplementation
(ref dpvo/torch_scatter.py:23,75,135,221).  On TPU these lower to XLA
scatter/segment reductions — no atomics, deterministic, differentiable.

All ops reduce over axis 0 of ``src`` according to integer ``index``;
``num_segments`` must be static for jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_sum(src, index, num_segments):
    """Sum src rows into segments. src (E, ...), index (E,) -> (S, ...)."""
    return jax.ops.segment_sum(src, index, num_segments=num_segments)


def scatter_mean(src, index, num_segments):
    s = jax.ops.segment_sum(src, index, num_segments=num_segments)
    cnt = jax.ops.segment_sum(jnp.ones_like(index, dtype=src.dtype), index,
                              num_segments=num_segments)
    cnt = jnp.maximum(cnt, 1)
    return s / cnt.reshape((-1,) + (1,) * (src.ndim - 1))


def scatter_max(src, index, num_segments):
    """Max-reduce src rows into segments (no argmax, unlike torch_scatter)."""
    return jax.ops.segment_max(src, index, num_segments=num_segments)


def scatter_softmax(src, index, num_segments):
    """Numerically-stable softmax within segments, broadcast back to rows.

    Matches torch_scatter.scatter_softmax semantics along dim 0
    (ref torch_scatter.py:75-134: max-subtraction for stability).
    """
    seg_max = jax.ops.segment_max(src, index, num_segments=num_segments)
    # empty segments produce -inf; make them safe
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = src - seg_max[index]
    e = jnp.exp(shifted)
    denom = jax.ops.segment_sum(e, index, num_segments=num_segments)
    denom = jnp.maximum(denom, 1e-12)
    return e / denom[index]


def compactify(ix, size, fill=jnp.iinfo(jnp.int32).max):
    """Static-shape analogue of ``torch.unique(ix, return_inverse=True)``.

    Returns (kx, ku): ``kx`` (size,) the sorted unique values padded with
    ``fill``; ``ku`` (E,) the index of each element of ``ix`` in ``kx``.
    ``size`` must be a static upper bound on the number of uniques.
    """
    kx = jnp.unique(ix, size=size, fill_value=fill)
    ku = jnp.searchsorted(kx, ix)
    return kx, ku
