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


def sorted_segment_sum(vals_sorted, start, end):
    """Segment sums for rows already sorted by group, via cumsum
    differences — O(E*D) with no scatter (TPU scatters serialize).

    vals_sorted (E, D); start/end (E,) int32: for every row, the first and
    last row index of its group.  Returns the group total broadcast to
    every row (E, D).
    """
    cs = jnp.cumsum(vals_sorted, axis=0)
    top = cs[end]
    bot = jnp.where((start > 0)[:, None], cs[jnp.maximum(start - 1, 0)],
                    0.0)
    return top - bot


def sorted_segment_softmax_sum(gate_sorted, vals_sorted, start, end):
    """Fused scatter_softmax + weighted scatter_sum for sorted rows.

    Computes w = softmax(gate) within each group and returns
    sum(w * vals) per group, broadcast to every row.  Stability comes
    from a global per-column shift (softmax is invariant to constant
    shifts within a group, and a global column shift is constant within
    every group).
    """
    shift = jax.lax.stop_gradient(
        jnp.max(gate_sorted, axis=0, keepdims=True))
    e = jnp.exp(gate_sorted - shift)
    denom = sorted_segment_sum(e, start, end)
    w = e / jnp.maximum(denom, 1e-12)
    return sorted_segment_sum(w * vals_sorted, start, end)


def group_meta(ids):
    """Host-side helper (numpy): sort metadata for sorted-segment ops.

    ids (E,) int group ids (any values; equal ids form a group).
    Returns (perm, inv_perm, start, end) int32 arrays, where start/end
    are per SORTED row.
    """
    import numpy as np
    ids = np.asarray(ids)
    E = len(ids)
    perm = np.argsort(ids, kind="stable").astype(np.int32)
    s = ids[perm]
    new_grp = np.empty(E, bool)
    new_grp[0] = True
    new_grp[1:] = s[1:] != s[:-1]
    grp_id = np.cumsum(new_grp) - 1
    starts_per_group = np.nonzero(new_grp)[0]
    ends_per_group = np.append(starts_per_group[1:] - 1, E - 1)
    start = starts_per_group[grp_id].astype(np.int32)
    end = ends_per_group[grp_id].astype(np.int32)
    inv_perm = np.empty(E, np.int32)
    inv_perm[perm] = np.arange(E, dtype=np.int32)
    return perm, inv_perm, start, end


def group_meta_compact_device(ids, order=None):
    """Sort metadata for the COMPACT segment path (see ops.agg_pallas):
    dense group ranks instead of per-row start/end bounds.

    ids (E,) int32 (equal values form a group; mask invalid rows to
    INT_MAX so they sort to the tail as a trash group).
    order (E,) optional precomputed stable sort permutation of ``ids``
    (any tie order) — lets callers share one sort across consumers.
    Returns (perm, gid_sorted, gid_orig) int32: ``perm`` sorts rows by
    group, ``gid_sorted`` are nondecreasing dense ranks (step <= 1) per
    sorted row, ``gid_orig[r] = gid_sorted[inv_perm[r]]`` maps each
    ORIGINAL row to its group rank.
    """
    E = ids.shape[0]
    perm = (jnp.argsort(ids, stable=True).astype(jnp.int32)
            if order is None else order.astype(jnp.int32))
    s = ids[perm]
    new_grp = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    gid_sorted = (jnp.cumsum(new_grp.astype(jnp.int32)) - 1).astype(
        jnp.int32)
    gid_orig = jnp.zeros((E,), jnp.int32).at[perm].set(gid_sorted)
    return perm, gid_sorted, gid_orig


def group_meta_device(ids):
    """Device twin of ``group_meta``: sort metadata for sorted-segment
    ops, computed inside the update program (a 12k argsort costs ~40us
    on TPU; the host version costs a thread sort + an upload RPC).

    ids (E,) int32 -> (perm, inv_perm, start, end) int32, matching
    ``group_meta`` bit-for-bit.
    """
    E = ids.shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    perm = jnp.argsort(ids, stable=True).astype(jnp.int32)
    s = ids[perm]
    new_grp = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    last = jnp.concatenate([new_grp[1:], jnp.ones((1,), bool)])
    start = jax.lax.cummax(jnp.where(new_grp, idx, -1))
    end = jnp.flip(jax.lax.cummin(jnp.flip(jnp.where(last, idx, E))))
    inv_perm = jnp.zeros((E,), jnp.int32).at[perm].set(idx)
    return perm, inv_perm, start.astype(jnp.int32), end.astype(jnp.int32)


def compactify(ix, size, fill=jnp.iinfo(jnp.int32).max):
    """Static-shape analogue of ``torch.unique(ix, return_inverse=True)``.

    Returns (kx, ku): ``kx`` (size,) the sorted unique values padded with
    ``fill``; ``ku`` (E,) the index of each element of ``ix`` in ``kx``.
    ``size`` must be a static upper bound on the number of uniques.
    """
    kx = jnp.unique(ix, size=size, fill_value=fill)
    ku = jnp.searchsorted(kx, ix)
    return kx, ku
