"""Edge-graph utilities for the patch graph (pure JAX, static shapes).

Replaces the reference's CPU-roundtrip ``fastba.neighbors``
(ref dpvo/fastba/ba.cpp:59-97): for every edge, find the previous/next edge
sharing the same patch ``kk``, ordered by target frame ``jj``.  The
reference syncs to CPU and builds std::vectors every update step; here it
is one stable argsort on device — no host sync (SURVEY.md §7 hard part 5).
"""
from __future__ import annotations

import jax.numpy as jnp


def neighbors(kk, jj, valid=None):
    """For each edge, index of the prev/next edge with the same ``kk``
    sorted by ``jj``; -1 where none exists.

    kk, jj (E,) int32; valid (E,) bool optional — invalid edges neither
    give nor receive neighbors.  Returns (ix, jx) each (E,) int32.
    """
    E = kk.shape[0]
    kk = kk.astype(jnp.int32)
    jj = jj.astype(jnp.int32)
    if valid is None:
        valid = jnp.ones((E,), dtype=bool)

    # lexicographic stable sort by (kk, jj); invalid edges sort last
    kk_m = jnp.where(valid, kk, jnp.iinfo(jnp.int32).max)
    order = jnp.lexsort((jj, kk_m))
    return neighbors_from_order(kk_m, valid, order)


def neighbors_from_order(kk_m, valid, order):
    """``neighbors`` body for a precomputed (kk, jj) lexsort ``order``
    over sentinel-masked keys ``kk_m`` — lets the update program share
    one sort between the temporal neighbors, the agg_kk compact
    metadata and the BA edge sort."""
    E = kk_m.shape[0]
    # group membership uses the masked keys: invalid edges (sentinel key)
    # can never match a real group, so they neither give nor receive
    kk_sorted = kk_m[order]
    valid_sorted = valid[order]

    same_prev = jnp.concatenate([
        jnp.array([False]), kk_sorted[1:] == kk_sorted[:-1]])
    same_next = jnp.concatenate([
        kk_sorted[:-1] == kk_sorted[1:], jnp.array([False])])
    same_prev = same_prev & valid_sorted
    same_next = same_next & valid_sorted

    prev_idx = jnp.where(same_prev,
                         jnp.roll(order, 1), -1)
    next_idx = jnp.where(same_next,
                         jnp.roll(order, -1), -1)

    # scatter back to original edge order
    ix = jnp.full((E,), -1, dtype=jnp.int32)
    jx = jnp.full((E,), -1, dtype=jnp.int32)
    ix = ix.at[order].set(prev_idx.astype(jnp.int32))
    jx = jx.at[order].set(next_idx.astype(jnp.int32))
    return ix, jx


def flatmeshgrid(a, b):
    """Cartesian product of two index arrays, flattened (ref utils.py:85)."""
    aa, bb = jnp.meshgrid(a, b, indexing="ij")
    return aa.reshape(-1), bb.reshape(-1)


def neighbors_host(kk, jj, e_num):
    """Numpy twin of ``neighbors`` for host-side precomputation (the edge
    bookkeeping lives on the host anyway; passing ix/jx in saves a device
    sort per update).  Rows >= e_num are invalid."""
    import numpy as np
    E = len(kk)
    kk_m = np.asarray(kk, np.int64).copy()
    kk_m[e_num:] = np.iinfo(np.int64).max
    order = np.lexsort((np.asarray(jj), kk_m))
    kk_sorted = kk_m[order]
    valid_sorted = np.zeros(E, bool)
    valid_sorted[:] = order < e_num

    same_prev = np.zeros(E, bool)
    same_next = np.zeros(E, bool)
    same_prev[1:] = kk_sorted[1:] == kk_sorted[:-1]
    same_next[:-1] = kk_sorted[:-1] == kk_sorted[1:]
    same_prev &= valid_sorted
    same_next &= valid_sorted

    prev_idx = np.where(same_prev, np.roll(order, 1), -1)
    next_idx = np.where(same_next, np.roll(order, -1), -1)

    ix = np.full(E, -1, np.int32)
    jx = np.full(E, -1, np.int32)
    ix[order] = prev_idx
    jx[order] = next_idx
    return ix, jx
