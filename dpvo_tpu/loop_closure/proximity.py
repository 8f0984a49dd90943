"""Proximity loop closure: flow-magnitude edge proposals + greedy NMS.

Rebuild of the reference's PatchGraph.edges_loop (ref patchgraph.py:56-82)
and reduce_edges (ref loop_closure/optim_utils.py:24-63, numba).  The flow
screening runs on device (one jitted flow_mag over the candidate set); the
greedy NMS is a tiny host loop over at most a few hundred survivors —
numpy is plenty (the reference needed numba because it ran per frame
inside the tracking loop; here candidates are already reduced on device).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import projective as pops


@jax.jit
def _flow_mag_center(poses, patches, intrinsics, ii, jj, kk):
    """Center-pixel flow magnitude for candidate edges (beta=0.5)."""
    flow, val = pops.flow_mag(poses, patches, intrinsics, ii, jj, kk,
                              beta=0.5)
    c = flow.shape[-1] // 2
    return flow[:, c, c], val[:, c, c]


def reduce_edges(flow_mag, ii, jj, max_num_edges=1000, nms=1):
    """Greedy lowest-flow-first edge selection with (i, j) NMS suppression
    (ref optim_utils.py:24-63): suppress neighbors within ``nms`` in both
    endpoints; skip |j - i| < 30."""
    es = []
    order = np.argsort(flow_mag)
    suppressed = set()
    for idx in order:
        if len(es) >= max_num_edges:
            break
        i, j = int(ii[idx]), int(jj[idx])
        if (i, j) in suppressed:
            continue
        if abs(j - i) < 30:
            continue
        es.append((i, j))
        for di in range(-nms, nms + 1):
            for dj in range(-nms, nms + 1):
                suppressed.add((i + di, j + dj))
    return np.array(es, dtype=np.int64).reshape(-1, 2)


def propose_loop_edges(slam):
    """Edges from old patches into recent frames (ref patchgraph.py:56-82).

    Returns (kk, jj) flat numpy arrays (possibly empty).
    """
    cfg = slam.cfg
    M = slam.M
    n = slam.n
    lc_range = cfg.MAX_EDGE_AGE
    l = n - cfg.REMOVAL_WINDOW  # upper bound for "old" patches

    if l <= 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)

    j0 = max(n - cfg.GLOBAL_OPT_FREQ, 0)
    j1 = n - cfg.KEYFRAME_INDEX
    if j1 <= j0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    k0 = max(l - lc_range, 0) * M
    k1 = l * M

    jr = np.arange(j0, j1, dtype=np.int32)
    kr = np.arange(k0, k1, dtype=np.int32)
    jj = np.repeat(jr, len(kr))
    kk = np.tile(kr, len(jr))
    ii = kk // M

    # device: flow magnitude per candidate edge at the patch center
    # (ref uses patches[...,1,1] only).  Candidates are padded to a
    # power-of-two bucket so the jitted program is reused across calls
    # (data-dependent shapes would recompile every proposal).
    ds = slam.ds
    E = len(kk)
    cap = 1 << int(np.ceil(np.log2(max(E, 1024))))
    pad = cap - E
    ii_p = np.concatenate([ii, np.zeros(pad, np.int32)])
    jj_p = np.concatenate([jj, np.zeros(pad, np.int32)])
    kk_p = np.concatenate([kk, np.zeros(pad, np.int32)])
    flow, val = _flow_mag_center(
        ds.poses, ds.patches, ds.intrinsics,
        jnp.asarray(ii_p), jnp.asarray(jj_p), jnp.asarray(kk_p))
    fl = np.asarray(flow[:E], np.float64).reshape(len(jr), len(kr))
    vl = np.asarray(val[:E]).reshape(len(jr), len(kr))

    # per (source frame, target frame) aggregation over that frame's M
    # patches (ref patchgraph.py:72-74)
    fl = fl.reshape(len(jr), -1, M)
    vl = vl.reshape(len(jr), -1, M)
    num_val = np.maximum(vl.sum(-1), 1)
    fsum = (fl * vl).sum(-1)
    fmag = np.where(vl.sum(-1) > (M * 0.75), fsum / num_val, np.inf)

    mask = fmag < cfg.BACKEND_THRESH
    if not mask.any():
        return np.zeros(0, np.int32), np.zeros(0, np.int32)

    ii_f = (np.arange(k0 // M, l)[None, :] * np.ones((len(jr), 1),
                                                    np.int64))[mask]
    jj_f = (jr[:, None] * np.ones((1, l - k0 // M), np.int64))[mask]
    es = reduce_edges(fmag[mask], ii_f, jj_f, max_num_edges=1000, nms=1)
    if len(es) == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)

    # expand each (i, j) pair to all M patches of frame i
    kk_out = (es[:, 0:1] * M + np.arange(M)[None, :]).reshape(-1)
    jj_out = np.repeat(es[:, 1], M)
    return kk_out.astype(np.int32), jj_out.astype(np.int32)
