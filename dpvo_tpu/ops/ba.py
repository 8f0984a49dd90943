"""Bundle adjustment: Gauss-Newton with Schur complement over keyframe
poses (6-dof) and per-patch inverse depths (1-dof).

Two variants, mirroring the reference:

- ``ba_iterative``  — inference twin of the cuda_ba extension
  (ref dpvo/fastba/ba_cuda.cu:232-582): non-differentiable fixed-iteration
  GN with the reference's robust masks (residual < 128 px, Z > 0.2,
  ±64 px in-bounds), damping ``S += I*(1e-4*S + 1)`` (ba_cuda.cu:546,560),
  and depth-reset retraction (d > 20 -> 1.0, clamp >= 1e-4,
  patch_retr_kernel ba_cuda.cu:209-228).

- ``ba_differentiable`` — training twin of the autodiff BA
  (ref dpvo/ba.py:86-182): bounds-based masks, damping
  ``A += (ep + lm*A)*I`` and the [1e-3, 10] depth clamp, fully
  differentiable through the Cholesky solve.

TPU-native design: no atomics — Hessian blocks are built with vectorized
outer products and scatter-adds (XLA lowers them to deterministic
scatter); the dense (6N, 6N) system stays small (N = optimization window)
and the Cholesky solve maps to the MXU.  All shapes are static: edges come
in fixed-capacity tables with validity masks, and the unique-patch set is
compacted to a static bound with ``scatter.compactify``.  All math fp32
with HIGHEST matmul precision (matching the reference's fp32 accumulators,
block_e.cuh:7).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import agg_pallas, lie, scatter

_HI = jax.lax.Precision.HIGHEST
_INT_MAX = jnp.iinfo(jnp.int32).max


def _blocked_cumsum(x, B=512):
    """Inclusive cumsum over axis 0 with two-level (blocked) accumulation.

    Mathematically identical to ``jnp.cumsum``; numerically, the
    within-block partial sums keep rounding error proportional to the
    BLOCK-local magnitude instead of the global prefix, so per-slot
    cumsum DIFFERENCES (``_per_slot``) stay accurate for slots late in
    the sort order at large E (ADVICE r1: the single-level cumsum
    degraded depth-update accuracy at E~16k).  Falls back to the plain
    cumsum when E is not a multiple of B (edge tables are bucketed to
    multiples of 1024).
    """
    E = x.shape[0]
    if E % B or E <= B:
        return jnp.cumsum(x, axis=0)
    nb = E // B
    xb = x.reshape((nb, B) + x.shape[1:])
    within = jnp.cumsum(xb, axis=1)
    totals = within[:, -1]
    prefix = jnp.concatenate(
        [jnp.zeros_like(totals[:1]), jnp.cumsum(totals[:-1], axis=0)], 0)
    ext = (slice(None), None) + (slice(None),) * (x.ndim - 1)
    return (within + prefix[ext]).reshape(x.shape)


def _edge_terms_center(poses, ctr, fx, fy, cx, cy, target, ii, jj, kk,
                       Gij=None):
    """Per-edge residuals and Jacobians at the central patch pixel,
    literal rebuild of reprojection_residuals_and_hessian
    (ba_cuda.cu:265-333).

    ctr (K, 3) holds each patch's CENTER [x, y, depth] — a compact
    row-major table the per-edge gathers stream from.  Gathering the
    same three scalars from the full (K, 3, P, P) patch table costs
    ~0.75 ms each at E=20k because XLA lays that table out lane-major
    (dim0 minor) for the in-place depth updates.

    Returns r (E,2), w_mask (E,), Ji (E,2,6), Jj (E,2,6), Jz (E,2).
    """
    if Gij is None:
        gi = poses[ii]
        gj = poses[jj]
        Gij = lie.se3_mul(gj, lie.se3_inv(gi))
    tij, qij = Gij[:, :3], Gij[:, 3:7]

    ce = ctr[kk]                                            # (E, 3)
    Xi = jnp.stack([
        (ce[:, 0] - cx) / fx,
        (ce[:, 1] - cy) / fy,
        jnp.ones_like(ce[:, 2]),
        ce[:, 2],
    ], axis=-1)
    Xj = lie.se3_act4(Gij, Xi)
    X, Y, Z, W = Xj[:, 0], Xj[:, 1], Xj[:, 2], Xj[:, 3]

    d = jnp.where(Z >= 0.2, 1.0 / jnp.where(Z >= 0.2, Z, 1.0), 0.0)
    d2 = d * d

    Zsafe = jnp.where(jnp.abs(Z) > 1e-6, Z, 1e-6)
    x1 = fx * (X / Zsafe) + cx
    y1 = fy * (Y / Zsafe) + cy

    rx = target[:, 0] - x1
    ry = target[:, 1] - y1
    r = jnp.stack([rx, ry], axis=-1)

    in_bounds = ((jnp.sqrt(rx * rx + ry * ry) < 128) & (Z > 0.2)
                 & (x1 > -64) & (y1 > -64)
                 & (x1 < 2 * cx + 64) & (y1 < 2 * cy + 64))
    mask = in_bounds.astype(jnp.float32)

    o = jnp.zeros_like(d)
    # row x (ba_cuda.cu:317-323)
    Jz_x = fx * (tij[:, 0] * d - tij[:, 2] * (X * d2))
    Jj_x = jnp.stack([fx * W * d, o, fx * -X * W * d2,
                      fx * -X * Y * d2, fx * (1 + X * X * d2),
                      fx * -Y * d], axis=-1)
    # row y (ba_cuda.cu:325-331)
    Jz_y = fy * (tij[:, 1] * d - tij[:, 2] * (Y * d2))
    Jj_y = jnp.stack([o, fy * W * d, fy * -Y * W * d2,
                      fy * (-1 - Y * Y * d2), fy * (X * Y * d2),
                      fy * X * d], axis=-1)

    Jj_rows = jnp.stack([Jj_x, Jj_y], axis=1)              # (E, 2, 6)
    Ji_rows = lie.se3_adjT(Gij[:, None], Jj_rows)          # adjSE3 (cu:337)
    Jz_rows = jnp.stack([Jz_x, Jz_y], axis=1)              # (E, 2)

    return r, mask, Ji_rows, Jj_rows, Jz_rows


@partial(jax.jit, static_argnames=("n_cap", "k_cap", "iterations",
                                   "pair_cap"))
def ba_iterative(poses, patches, intrinsics, target, weight, lmbda,
                 ii, jj, kk, valid, t0, t1, n_cap, k_cap, iterations=2,
                 eperm=None, pair_gid=None, pair_cap=None,
                 pair_rep=None):
    """Inference BA (twin of cuda_ba, ba_cuda.cu:433-582).

    poses      (Np, 7) fp32
    patches    (Kp, 3, P, P) fp32 (flat patch table)
    intrinsics (4,) shared [fx, fy, cx, cy] (the CUDA kernel reads
               intrinsics[0] only, ba_cuda.cu:254-258)
    target, weight (E, 2) fp32; lmbda scalar
    ii, jj, kk (E,) int32; valid (E,) bool
    t0, t1     dynamic ints — poses in [t0, t1) are free
    n_cap      static pose-block capacity (>= t1 - t0)
    k_cap      static unique-patch capacity
    eperm      optional precomputed stable sort of the valid-masked
               ``kk`` (any tie order — runs only need to be contiguous;
               the engine shares its (kk, jj) lexsort, saving one
               45k-row argsort per update)
    pair_gid   optional (E,) dense frame-pair ranks (< pair_cap,
               static), in the INPUT edge order — enables the per-PAIR
               relative-pose table inside each GN iteration (~300 pairs
               vs 45k edges at the retain bucket)
    pair_rep   optional (pair_cap,) representative edge index per pair
               rank in the INPUT edge order (the engine computes it
               from its sorted agg_ij metadata); skips this function's
               45k-update scatter-min
    Returns (poses', patches').
    """
    poses = jnp.asarray(poses, jnp.float32)
    patches = jnp.asarray(patches, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    weight = jnp.asarray(weight, jnp.float32)
    fx, fy, cx, cy = [jnp.asarray(intrinsics[i], jnp.float32)
                      for i in range(4)]
    E = ii.shape[0]
    P = patches.shape[-1]

    # sort edges by (masked) patch id: the pose-depth coupling columns
    # then assemble with cumsum differences over contiguous runs instead
    # of an (E, k_cap) one-hot matmul — at E=16k, k_cap=4k the one-hot
    # costs ~270MB of HBM traffic per GN iteration.  Edge order only
    # permutes f32 accumulation order.
    kk_m = jnp.where(valid, kk, _INT_MAX)
    if eperm is None:
        eperm = jnp.argsort(kk_m, stable=True)
    ii_orig, jj_orig = ii, jj
    ii = ii[eperm]
    jj = jj[eperm]
    kk = kk[eperm]
    valid = valid[eperm]
    target = target[eperm]
    weight = weight[eperm]
    kk_m = kk_m[eperm]                                      # sorted

    pg = rep_ii = rep_jj = None
    if pair_gid is not None:
        pg = pair_gid[eperm]
        if pair_rep is not None:
            # (pair_cap,) frame ids per pair straight from the
            # input-order index vectors — no scatter at all
            rep_ii = ii_orig[pair_rep]
            rep_jj = jj_orig[pair_rep]
        else:
            rep_pair = jnp.full((pair_cap,), E - 1, jnp.int32).at[
                pg].min(jnp.arange(E, dtype=jnp.int32))     # sorted-row rep
            rep_ii = ii[rep_pair]
            rep_jj = jj[rep_pair]

    # compact the touched patch set to k_cap slots (cuda: torch::_unique).
    # kk_m is sorted, so compact slot ids are a cumsum over run starts —
    # no searchsorted (a 16k-query searchsorted costs ~1.5 ms on TPU)
    new_run = jnp.concatenate([jnp.ones((1,), bool),
                               kk_m[1:] != kk_m[:-1]])
    gid = jnp.cumsum(new_run.astype(jnp.int32)) - 1         # (E,)
    use_seg_kernel = (jax.default_backend() == "tpu"
                      and E % agg_pallas.BLK == 0)
    kx = jnp.full((k_cap,), _INT_MAX, jnp.int32).at[gid].set(
        kk_m, mode="drop")                                  # sorted uniques
    idx_e = jnp.arange(E, dtype=jnp.int32)
    # contiguous run [run_s, run_e) of each compact slot in sorted order
    run_s = jnp.full((k_cap,), E, jnp.int32).at[gid].min(idx_e,
                                                         mode="drop")
    run_e = jnp.zeros((k_cap,), jnp.int32).at[gid].max(idx_e + 1,
                                                       mode="drop")
    nonempty = (run_e > run_s) & (kx != _INT_MAX)           # (k_cap,)
    run_e1 = jnp.clip(run_e - 1, 0, E - 1)

    def _per_slot(cs):
        """Segment totals per compact slot from an inclusive cumsum
        over sorted edges; cs (E, ...) -> (k_cap, ...)."""
        ext = (slice(None),) + (None,) * (cs.ndim - 1)
        lo = jnp.where((run_s > 0)[ext],
                       cs[jnp.clip(run_s - 1, 0, E - 1)], 0.0)
        return jnp.where(nonempty[ext], cs[run_e1] - lo, 0.0)

    # patch-row -> compact-slot map for the depth retraction, built once
    # with 1D scatters (a jnp.searchsorted over all K rows costs ~2.3 ms
    # on TPU; scatters of 4k scalars are ~50 us).  INT_MAX pad entries
    # of kx drop out.
    K = patches.shape[0]
    slot_of_k = jnp.zeros((K,), jnp.int32).at[kx].set(
        jnp.arange(k_cap, dtype=jnp.int32), mode="drop")
    hit_k = jnp.zeros((K,), bool).at[kx].set(True, mode="drop")

    ctr0 = patches[:, :, P // 2, P // 2]                    # (K, 3)

    def iteration(_, state):
        poses, patches, ctr = state

        Gij_e = None
        if pg is not None:
            Gt = lie.se3_mul(poses[rep_jj],
                             lie.se3_inv(poses[rep_ii]))
            Gij_e = Gt[pg]
        r, mask, Ji, Jj, Jz = _edge_terms_center(
            poses, ctr, fx, fy, cx, cy, target, ii, jj, kk, Gij=Gij_e)

        w = mask[:, None] * weight * valid[:, None]         # (E, 2)

        # local pose indices; contributions from fixed poses are masked
        li = ii - t0
        lj = jj - t0
        vi = (li >= 0) & (li < n_cap) & valid
        vj = (lj >= 0) & (lj < n_cap) & valid
        lic = jnp.clip(li, 0, n_cap - 1)
        ljc = jnp.clip(lj, 0, n_cap - 1)

        # --- scatter-free assembly (TPU: matmuls instead of atomics) ---
        # Effective pose Jacobian per residual row: the CUDA kernel's
        # accumulation pattern (B[ii,ii] += JiJi, B[ii,jj] -= JiJj, ...,
        # ba_cuda.cu:339-373) is exactly J_eff^T W [J_eff | Jz | r] with
        # J_eff = -Ji placed at block li + Jj placed at block lj.  Building
        # J_eff densely over the n_cap window turns every scatter-add into
        # an MXU matmul.
        oh_i = ((lic[:, None] == jnp.arange(n_cap)) & vi[:, None]
                ).astype(jnp.float32)                       # (E, n_cap)
        oh_j = ((ljc[:, None] == jnp.arange(n_cap)) & vj[:, None]
                ).astype(jnp.float32)

        # (E, 2, n_cap, 6) -> (E, 2, 6*n_cap)
        Jeff = (-oh_i[:, None, :, None] * Ji[:, :, None, :]
                + oh_j[:, None, :, None] * Jj[:, :, None, :])
        D = 6 * n_cap
        Jeff = Jeff.reshape(E, 2, D)
        wJeff = w[:, :, None] * Jeff

        B = jnp.einsum("era,erb->ab", wJeff, Jeff, precision=_HI)
        vvec = jnp.einsum("era,er->a", wJeff, r, precision=_HI)

        # pose-depth coupling: each edge touches one patch column ku;
        # edges are kk-sorted, so the per-slot sums reduce over
        # contiguous runs (w already carries `valid`)
        A = jnp.einsum("er,era->ea", w * Jz, Jeff, precision=_HI)  # (E, D)
        Cu_rows = jnp.stack([jnp.sum(w * Jz * Jz, axis=1),
                             jnp.sum(w * r * Jz, axis=1)], axis=-1)
        if use_seg_kernel:
            # TPU: one Pallas compact segment-sum over [A | C | u]
            # replaces the blocked cumsums + run-boundary gathers
            # (~1.2 ms/iteration at the 45k bucket)
            S = agg_pallas.segment_sums(
                jnp.concatenate([A, Cu_rows], axis=1), gid,
                k_cap + 1)[:k_cap]
            Emat = S[:, :D].T                           # (D, k_cap)
            C, u = S[:, D], S[:, D + 1]
        else:
            Emat = _per_slot(_blocked_cumsum(A)).T      # (D, k_cap)
            Cu = _per_slot(_blocked_cumsum(Cu_rows))    # (k_cap, 2)
            C, u = Cu[:, 0], Cu[:, 1]

        Q = 1.0 / (C + lmbda)                               # (k_cap,)

        # Schur complement (ba_cuda.cu:552-563)
        EQ = Emat * Q[None, :]
        S = B - jnp.matmul(EQ, Emat.T, precision=_HI)
        y = vvec - jnp.matmul(EQ, u, precision=_HI)

        # damping: S += I * (1e-4 * S + 1)  (ba_cuda.cu:560)
        diag = jnp.diagonal(S)
        S = S + jnp.diag(1e-4 * diag + 1.0)

        # solve; on failure (non-PD) skip the update like the python
        # wrapper's try/except (dpvo.py:355-356)
        L, lower = jax.scipy.linalg.cho_factor(S, lower=True)
        dX = jax.scipy.linalg.cho_solve((L, lower), y)
        ok = jnp.all(jnp.isfinite(dX))
        dX = jnp.where(ok, dX, 0.0)

        dZ = Q * (u - jnp.matmul(Emat.T, dX, precision=_HI))
        dZ = jnp.where(ok, dZ, 0.0)

        # pose retraction for poses [t0, t1) (pose_retr_kernel cu:178-206)
        dX_blocks = dX.reshape(n_cap, 6)
        pose_slot = jnp.arange(poses.shape[0])
        lp = pose_slot - t0
        free = (lp >= 0) & (pose_slot < t1)
        dxi = jnp.where(free[:, None],
                        dX_blocks[jnp.clip(lp, 0, n_cap - 1)], 0.0)
        poses = jnp.where(free[:, None], lie.se3_retr(poses, dxi), poses)

        # patch retraction (patch_retr_kernel cu:209-228).  TPU row
        # scatters serialize (~1.2 ms for 2k rows at this scale), so the
        # update is a GATHER: kx is sorted (compactify), so every patch
        # row finds its compact slot via searchsorted and blends densely.
        kx_c = jnp.clip(kx, 0, K - 1)
        d_new = patches[kx_c, 2, 0, 0] + dZ
        d_new = jnp.where(d_new > 20.0, 1.0, d_new)
        d_new = jnp.maximum(d_new, 1e-4)
        depth = jnp.where(hit_k[:, None, None],
                          d_new[slot_of_k][:, None, None], patches[:, 2])
        patches = patches.at[:, 2].set(depth)
        ctr = ctr.at[:, 2].set(
            jnp.where(hit_k, d_new[slot_of_k], ctr[:, 2]))

        return poses, patches, ctr

    poses, patches, _ = jax.lax.fori_loop(0, iterations, iteration,
                                          (poses, patches, ctr0))
    return poses, patches


def ba_iterative_sharded(poses, patches, intrinsics, target, weight, lmbda,
                         ii, jj, kk, valid, t0, t1, n_cap, k_cap,
                         iterations, axis_name):
    """Edge-sharded twin of ``ba_iterative`` for use INSIDE ``shard_map``
    (docs/MULTICHIP.md "edge-sharded SLAM inference").

    Every shard holds a slice of the edge tables (replicated
    poses/patches/intrinsics) and computes its partial normal-equation
    quantities; one ``psum`` of (B (D,D), v (D,), E (D,k_cap),
    C/u (k_cap,)) — ~1.6 MB at D=96, k_cap=4096 — then every shard
    solves the same small damped Schur system redundantly and applies
    identical retractions, so poses/patches stay replicated.  No
    per-edge data ever crosses chips.

    Masks / damping / depth-reset semantics are identical to
    ``ba_iterative``; the patch slots use a GLOBAL dense mapping
    ``kk - k_lo`` (k_lo = mesh-wide min live patch id) instead of the
    sorted compaction, which requires the live patch span to fit k_cap —
    true for the windowed tracking loop (PATCH_LIFETIME * M << k_cap).
    Edges whose ``kk - k_lo`` falls outside k_cap are zero-weighted in
    here (static shapes forbid raising inside shard_map); callers must
    validate the span on the host first —
    ``parallel.infer_step.shard_edges_by_patch(..., k_cap=...)`` raises
    on overflow before any device work is dispatched.
    """
    poses = jnp.asarray(poses, jnp.float32)
    patches = jnp.asarray(patches, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    weight = jnp.asarray(weight, jnp.float32)
    fx, fy, cx, cy = [jnp.asarray(intrinsics[i], jnp.float32)
                      for i in range(4)]
    E = ii.shape[0]
    P = patches.shape[-1]
    K = patches.shape[0]

    k_lo = jax.lax.pmin(jnp.min(jnp.where(valid, kk, _INT_MAX)),
                        axis_name)
    rel = kk - k_lo
    in_rng = valid & (rel >= 0) & (rel < k_cap)
    slot = jnp.where(in_rng, jnp.clip(rel, 0, k_cap - 1), k_cap)

    # global slot -> patch row (replicated); rows >= K dropped on write
    slot_rows = k_lo + jnp.arange(k_cap, dtype=jnp.int32)
    slot_rows_c = jnp.clip(slot_rows, 0, K - 1)
    cnt = jax.lax.psum(
        jax.ops.segment_sum(in_rng.astype(jnp.float32), slot,
                            num_segments=k_cap + 1)[:k_cap], axis_name)
    touched = (cnt > 0) & (slot_rows < K)

    ctr0 = patches[:, :, P // 2, P // 2]                    # (K, 3)

    def iteration(_, state):
        poses, patches, ctr = state

        r, mask, Ji, Jj, Jz = _edge_terms_center(
            poses, ctr, fx, fy, cx, cy, target, ii, jj, kk)
        w = mask[:, None] * weight * in_rng[:, None]        # (E, 2)

        li = ii - t0
        lj = jj - t0
        vi = (li >= 0) & (li < n_cap) & in_rng
        vj = (lj >= 0) & (lj < n_cap) & in_rng
        lic = jnp.clip(li, 0, n_cap - 1)
        ljc = jnp.clip(lj, 0, n_cap - 1)

        oh_i = ((lic[:, None] == jnp.arange(n_cap)) & vi[:, None]
                ).astype(jnp.float32)
        oh_j = ((ljc[:, None] == jnp.arange(n_cap)) & vj[:, None]
                ).astype(jnp.float32)
        Jeff = (-oh_i[:, None, :, None] * Ji[:, :, None, :]
                + oh_j[:, None, :, None] * Jj[:, :, None, :])
        D = 6 * n_cap
        Jeff = Jeff.reshape(E, 2, D)
        wJeff = w[:, :, None] * Jeff

        B = jnp.einsum("era,erb->ab", wJeff, Jeff, precision=_HI)
        vvec = jnp.einsum("era,er->a", wJeff, r, precision=_HI)

        A = jnp.einsum("er,era->ea", w * Jz, Jeff, precision=_HI)
        Emat = jax.ops.segment_sum(A, slot,
                                   num_segments=k_cap + 1)[:k_cap].T
        Cu = jnp.stack([jnp.sum(w * Jz * Jz, axis=1),
                        jnp.sum(w * r * Jz, axis=1)], axis=-1)
        Cu = jax.ops.segment_sum(Cu, slot,
                                 num_segments=k_cap + 1)[:k_cap]

        # ONE fused cross-shard reduction of all partials
        B, vvec, Emat, Cu = jax.lax.psum((B, vvec, Emat, Cu), axis_name)
        C, u = Cu[:, 0], Cu[:, 1]

        Q = 1.0 / (C + lmbda)

        EQ = Emat * Q[None, :]
        S = B - jnp.matmul(EQ, Emat.T, precision=_HI)
        y = vvec - jnp.matmul(EQ, u, precision=_HI)

        diag = jnp.diagonal(S)
        S = S + jnp.diag(1e-4 * diag + 1.0)

        L, lower = jax.scipy.linalg.cho_factor(S, lower=True)
        dX = jax.scipy.linalg.cho_solve((L, lower), y)
        ok = jnp.all(jnp.isfinite(dX))
        dX = jnp.where(ok, dX, 0.0)

        dZ = Q * (u - jnp.matmul(Emat.T, dX, precision=_HI))
        dZ = jnp.where(ok, dZ, 0.0)

        dX_blocks = dX.reshape(n_cap, 6)
        pose_slot = jnp.arange(poses.shape[0])
        lp = pose_slot - t0
        free = (lp >= 0) & (pose_slot < t1)
        dxi = jnp.where(free[:, None],
                        dX_blocks[jnp.clip(lp, 0, n_cap - 1)], 0.0)
        poses = jnp.where(free[:, None], lie.se3_retr(poses, dxi), poses)

        d_old = patches[slot_rows_c, 2, 0, 0]
        d_new = d_old + dZ
        d_new = jnp.where(d_new > 20.0, 1.0, d_new)
        d_new = jnp.maximum(d_new, 1e-4)
        d_new = jnp.where(touched, d_new, d_old)
        patches = patches.at[slot_rows, 2].set(
            jnp.broadcast_to(d_new[:, None, None], (k_cap, P, P)),
            mode="drop")
        ctr = ctr.at[slot_rows, 2].set(d_new, mode="drop")

        return poses, patches, ctr

    poses, patches, _ = jax.lax.fori_loop(0, iterations, iteration,
                                          (poses, patches, ctr0))
    return poses, patches


# ---------------------------------------------------------------------------
# Differentiable training BA (twin of dpvo/ba.py)
# ---------------------------------------------------------------------------

def _transform_with_jacobian(poses, patches, intrinsics, ii, jj, kk):
    """Center-pixel transform + Jacobians in the training-BA convention
    (ref projective_ops.transform(jacobian=True), ba.py:92-93).

    intrinsics here is per-frame (N, 4) like the training path.
    """
    from . import projective as pops
    return pops.transform(poses, patches, intrinsics, ii, jj, kk,
                          jacobian=True)


@partial(jax.jit, static_argnames=("k_cap", "fixedp", "structure_only"))
def ba_differentiable(poses, patches, intrinsics, targets, weights, lmbda,
                      ii, jj, kk, valid, bounds, ep=10.0, fixedp=1,
                      structure_only=False, k_cap=None):
    """Differentiable GN step with Schur complement (ref ba.py:86-182).

    poses (N, 7), patches (K, 3, P, P), intrinsics (N, 4),
    targets/weights (E, 2), ii/jj/kk (E,), valid (E,) bool,
    bounds [x0, y0, x1, y1].
    The number of free poses is N - fixedp (static); k_cap bounds the
    unique patch count (defaults to E).
    """
    from . import projective as pops

    N = poses.shape[0]
    E = ii.shape[0]
    if k_cap is None:
        k_cap = E
    poses = jnp.asarray(poses, jnp.float32)
    patches = jnp.asarray(patches, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)

    coords, v, (Ji, Jj, Jz) = pops.transform(
        poses, patches, intrinsics, ii, jj, kk, jacobian=True)

    P = coords.shape[1]
    c = P // 2
    r = targets - coords[:, c, c]                           # (E, 2)

    v = v * (jnp.linalg.norm(r, axis=-1) < 250)             # ref ba.py:98
    in_bounds = ((coords[:, c, c, 0] > bounds[0])
                 & (coords[:, c, c, 1] > bounds[1])
                 & (coords[:, c, c, 0] < bounds[2])
                 & (coords[:, c, c, 1] < bounds[3]))
    v = v * in_bounds * valid

    r = v[:, None] * r
    w = v[:, None] * weights

    # fix first `fixedp` poses (ref ba.py:129-135)
    n = N - fixedp
    ii_ = ii - fixedp
    jj_ = jj - fixedp

    kk_m = jnp.where(valid, kk, _INT_MAX)
    kx, ku = scatter.compactify(kk_m, size=k_cap)
    k_real = kx != _INT_MAX

    # --- scatter-free assembly: J_eff design matrix (see ba_iterative) ---
    # Here Ji already carries the adjoint sign (Ji = -adjT(Jj) from
    # transform), so the reference accumulates ALL-POSITIVE blocks
    # (ba.py:140-153): J_eff = Ji placed at block ii_ + Jj at block jj_.
    vi_ok = (ii_ >= 0) & (ii_ < n)
    vj_ok = (jj_ >= 0) & (jj_ < n)
    oh_i = ((jnp.clip(ii_, 0, n - 1)[:, None] == jnp.arange(n))
            & vi_ok[:, None]).astype(jnp.float32)           # (E, n)
    oh_j = ((jnp.clip(jj_, 0, n - 1)[:, None] == jnp.arange(n))
            & vj_ok[:, None]).astype(jnp.float32)

    Jeff = (oh_i[:, None, :, None] * Ji[:, :, None, :]
            + oh_j[:, None, :, None] * Jj[:, :, None, :])   # (E, 2, n, 6)
    Dn = 6 * n
    Jeff = Jeff.reshape(E, 2, Dn)
    wJeff = w[:, :, None] * Jeff

    Bm = jnp.einsum("era,erb->ab", wJeff, Jeff, precision=_HI)
    vv = jnp.einsum("era,er->a", wJeff, r, precision=_HI)    # (6n,)

    Jz2 = Jz[:, :, 0]                                        # (E, 2)
    A = jnp.einsum("er,era->ea", w * Jz2, Jeff, precision=_HI)
    oh_k = ((ku[:, None] == jnp.arange(k_cap))
            & (v > 0)[:, None]).astype(jnp.float32)          # (E, k_cap)
    Ef = jnp.matmul(A.T, oh_k, precision=_HI)                # (6n, k_cap)

    C = jnp.matmul(jnp.sum(w * Jz2 * Jz2, axis=1)[None], oh_k,
                   precision=_HI)[0]
    u = jnp.matmul(jnp.sum(w * r * Jz2, axis=1)[None], oh_k,
                   precision=_HI)[0]

    Q = 1.0 / (C + lmbda)                                    # (k_cap,)

    if structure_only or n == 0:
        dZ = Q * u
        dX = jnp.zeros((n, 6), jnp.float32)
    else:
        # S = B - E Q E^T as a dense (6n, 6n) system (ref ba.py:167-173)
        EQf = Ef * Q[None, :]
        S = Bm - jnp.matmul(EQf, Ef.T, precision=_HI)
        y = vv - jnp.matmul(EQf, u, precision=_HI)

        # damping A += (ep + lm*A) * I  (ref blocks block_solve ba.py:73)
        diag = jnp.diagonal(S)
        S = S + jnp.diag(ep + 1e-4 * diag)

        L, lower = jax.scipy.linalg.cho_factor(S, lower=True)
        dX = jax.scipy.linalg.cho_solve((L, lower), y)
        ok = jnp.all(jnp.isfinite(dX))
        dX = jnp.where(ok, dX, 0.0)

        dZ = Q * (u - jnp.matmul(Ef.T, dX, precision=_HI))
        dZ = jnp.where(ok, dZ, 0.0)
        dX = dX.reshape(n, 6)

    # depth retraction + clamp (ref ba.py:175-177)
    K = patches.shape[0]
    dZ_full = jnp.zeros((K,), jnp.float32).at[
        jnp.clip(kx, 0, K - 1)].add(jnp.where(k_real, dZ, 0.0), mode="drop")
    disps = patches[:, 2] + dZ_full[:, None, None]
    disps = jnp.clip(disps, 1e-3, 10.0)
    patches = patches.at[:, 2].set(disps)

    # pose retraction (ref ba.py:179-180)
    if not structure_only and n > 0:
        dxi = jnp.concatenate([jnp.zeros((fixedp, 6), jnp.float32), dX],
                              axis=0)
        poses = lie.se3_retr(poses, dxi)

    return poses, patches


# ---------------------------------------------------------------------------
# Scalable global BA (EfficentE analog)
# ---------------------------------------------------------------------------

def _seg_sum(data, ids, n):
    return jax.ops.segment_sum(data, ids, num_segments=n)


@partial(jax.jit, static_argnames=("n_cap", "k_cap", "iterations",
                                   "cg_iters"))
def ba_global(poses, patches, intrinsics, target, weight, lmbda,
              ii, jj, kk, valid, t0, t1, n_cap, k_cap,
              iterations=2, cg_iters=48):
    """Scalable global BA — the EfficentE analog (ref fastba/block_e.cu:
    43-145, eff_impl=True path of cuda_ba).

    Identical masks / damping / retraction semantics to ``ba_iterative``,
    but nothing is densified over the pose window:

    - the pose-depth coupling E stays compressed as a per-patch host
      block ``Ei (k_cap, 6)`` (every edge of a patch shares its host
      frame, exactly block_e.cu's frame-pair blocks) plus a per-edge
      target block ``Ej (E, 6)``;
    - the damped Schur system solves with block-Jacobi preconditioned
      conjugate gradients, where S@x is evaluated matrix-free from
      per-edge products + segment sums.

    Memory is O(E*24 + n_cap*36 + k_cap*6) — at n_cap=1024, E=57k this
    is ~7 MB where ba_iterative's dense Jeff would be ~2.8 GB.
    """
    poses = jnp.asarray(poses, jnp.float32)
    patches = jnp.asarray(patches, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    weight = jnp.asarray(weight, jnp.float32)
    fx, fy, cx, cy = [jnp.asarray(intrinsics[i], jnp.float32)
                      for i in range(4)]
    E = ii.shape[0]
    P = patches.shape[-1]

    kk_m = jnp.where(valid, kk, _INT_MAX)
    kx, ku = scatter.compactify(kk_m, size=k_cap)
    k_real = kx != _INT_MAX

    ctr0 = patches[:, :, P // 2, P // 2]                    # (K, 3)

    def iteration(_, state):
        poses, patches, ctr = state
        r, mask, Ji, Jj, Jz = _edge_terms_center(
            poses, ctr, fx, fy, cx, cy, target, ii, jj, kk)
        w = mask[:, None] * weight * valid[:, None]          # (E, 2)

        li = ii - t0
        lj = jj - t0
        vi = (li >= 0) & (li < n_cap) & valid
        vj = (lj >= 0) & (lj < n_cap) & valid
        lic = jnp.clip(li, 0, n_cap - 1)
        ljc = jnp.clip(lj, 0, n_cap - 1)

        # signed, visibility-masked pose Jacobians (B[ii,*] uses -Ji:
        # ba_cuda.cu:339-373)
        Jim = -Ji * vi[:, None, None].astype(jnp.float32)    # (E, 2, 6)
        Jjm = Jj * vj[:, None, None].astype(jnp.float32)

        z = w * Jz                                           # (E, 2)

        # depth diagonal + rhs per unique patch
        C = _seg_sum(jnp.sum(w * Jz * Jz, axis=1), ku, k_cap)
        u = _seg_sum(jnp.sum(z * r, axis=1), ku, k_cap)
        Q = 1.0 / (C + lmbda)

        # compressed coupling blocks
        Ei = _seg_sum(jnp.einsum("er,erd->ed", z, Jim), ku, k_cap)
        Ej = jnp.einsum("er,erd->ed", z, Jjm)                # (E, 6)
        # host-frame pose block of each unique patch (all its edges
        # share ii = kk // M)
        li_k = jax.ops.segment_max(
            jnp.where(valid, lic, 0), ku, num_segments=k_cap)
        li_k = jnp.clip(li_k, 0, n_cap - 1)

        # pose rhs v = Jeff^T W r
        wr = w * r                                           # (E, 2)
        v_b = (_seg_sum(jnp.einsum("er,erd->ed", wr, Jim), lic, n_cap)
               + _seg_sum(jnp.einsum("er,erd->ed", wr, Jjm), ljc, n_cap))

        # diagonal + 6x6 block-diagonal of S (for damping/preconditioner)
        bb = (_seg_sum(jnp.einsum("er,era,erb->eab", w, Jim, Jim),
                       lic, n_cap)
              + _seg_sum(jnp.einsum("er,era,erb->eab", w, Jjm, Jjm),
                         ljc, n_cap))                        # (n, 6, 6)
        ee = (_seg_sum(Q[:, None, None] * Ei[:, :, None] * Ei[:, None, :],
                       li_k, n_cap)
              + _seg_sum(Q[ku][:, None, None]
                         * Ej[:, :, None] * Ej[:, None, :], ljc, n_cap))
        Sblk = bb - ee
        diagS = jnp.diagonal(Sblk, axis1=1, axis2=2)         # (n, 6)
        damp = 1e-4 * diagS + 1.0                            # cu:560
        Mblk = Sblk + jax.vmap(jnp.diag)(damp)
        # block-Jacobi inverse (6x6 per pose)
        Minv = jnp.linalg.inv(
            Mblk + 1e-8 * jnp.eye(6)[None])                  # (n, 6, 6)

        def Sx(x):
            """(n_cap, 6) -> (n_cap, 6): (S + damp*I) @ x, matrix-free."""
            xi = x[lic]
            xj = x[ljc]
            u1 = (jnp.einsum("erd,ed->er", Jim, xi)
                  + jnp.einsum("erd,ed->er", Jjm, xj))       # (E, 2)
            wu = w * u1
            bx = (_seg_sum(jnp.einsum("er,erd->ed", wu, Jim), lic, n_cap)
                  + _seg_sum(jnp.einsum("er,erd->ed", wu, Jjm),
                             ljc, n_cap))
            # E^T x then E (Q .)
            tk = (jnp.einsum("kd,kd->k", Ei, x[li_k])
                  + _seg_sum(jnp.einsum("ed,ed->e", Ej, xj), ku, k_cap))
            yk = Q * tk
            cx_ = (_seg_sum(Ei * yk[:, None], li_k, n_cap)
                   + _seg_sum(Ej * yk[ku][:, None], ljc, n_cap))
            return bx - cx_ + damp * x

        # rhs y = v - E Q u
        tu = Q * u
        equ = (_seg_sum(Ei * tu[:, None], li_k, n_cap)
               + _seg_sum(Ej * tu[ku][:, None], ljc, n_cap))
        rhs = v_b - equ

        def precond(v):
            return jnp.einsum("nab,nb->na", Minv, v)

        # preconditioned CG
        x0 = jnp.zeros_like(rhs)
        r0 = rhs
        z0 = precond(r0)
        p0 = z0

        def cg_step(_, s):
            x, rr, zz, p = s
            Ap = Sx(p)
            rz = jnp.sum(rr * zz)
            denom = jnp.sum(p * Ap)
            alpha = jnp.where(jnp.abs(denom) > 1e-12, rz / denom, 0.0)
            x = x + alpha * p
            r2 = rr - alpha * Ap
            z2 = precond(r2)
            beta = jnp.where(jnp.abs(rz) > 1e-12,
                             jnp.sum(r2 * z2) / rz, 0.0)
            p = z2 + beta * p
            return x, r2, z2, p

        dXb, *_ = jax.lax.fori_loop(0, cg_iters, cg_step,
                                    (x0, r0, z0, p0))
        ok = jnp.all(jnp.isfinite(dXb))
        dXb = jnp.where(ok, dXb, 0.0)

        # depth back-substitution dZ = Q (u - E^T dX)
        tk = (jnp.einsum("kd,kd->k", Ei, dXb[li_k])
              + _seg_sum(jnp.einsum("ed,ed->e", Ej, dXb[ljc]),
                         ku, k_cap))
        dZ = jnp.where(ok, Q * (u - tk), 0.0)

        # retractions (identical to ba_iterative)
        pose_slot = jnp.arange(poses.shape[0])
        lp = pose_slot - t0
        free = (lp >= 0) & (pose_slot < t1)
        dxi = jnp.where(free[:, None],
                        dXb[jnp.clip(lp, 0, n_cap - 1)], 0.0)
        poses = jnp.where(free[:, None], lie.se3_retr(poses, dxi), poses)

        kx_c = jnp.clip(kx, 0, patches.shape[0] - 1)
        d_old = patches[kx_c, 2, 0, 0]
        d_new = d_old + dZ
        d_new = jnp.where(d_new > 20.0, 1.0, d_new)
        d_new = jnp.maximum(d_new, 1e-4)
        d_new = jnp.where(k_real, d_new, d_old)
        patches = patches.at[kx_c, 2].set(
            jnp.broadcast_to(d_new[:, None, None], (k_cap, P, P)),
            mode="drop")
        ctr = ctr.at[kx_c, 2].set(d_new, mode="drop")
        return poses, patches, ctr

    poses, patches, _ = jax.lax.fori_loop(0, iterations, iteration,
                                          (poses, patches, ctr0))
    return poses, patches
