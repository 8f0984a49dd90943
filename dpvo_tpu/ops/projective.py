"""Patch-based projective geometry (pure JAX).

TPU-native rebuild of the reference's dpvo/projective_ops.py: pinhole
lift/project/reproject for 3x3 patches with analytic Jacobians, plus the
DROID-style dense-disparity variants used for co-visibility frame-graph
construction (ref projective_ops.py:19,32,53,115,120,136-318).

Conventions (unbatched; callers vmap if needed):
- poses       (N, 7)  SE3 world-from-camera (inverse poses, like the ref)
- patches     (K, 3, P, P)   channels = (x, y, inv_depth) at feature res
- intrinsics  (N, 4)  [fx, fy, cx, cy] at feature resolution
- ii, jj, kk  (E,) int32  source frame / target frame / patch index
- returned coords  (E, P, P, 2)
All geometry runs in float32 regardless of input dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie

MIN_DEPTH = 0.2  # ref projective_ops.py:6

_HI = jax.lax.Precision.HIGHEST


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def iproj(patches, intrinsics):
    """Inverse projection: patch pixels -> homogeneous points.

    patches (E, 3, P, P), intrinsics (E, 4) -> X (E, P, P, 4) = [xn, yn, 1, d]
    (ref projective_ops.py:19-29).
    """
    patches, intrinsics = _f32(patches), _f32(intrinsics)
    x, y, d = patches[:, 0], patches[:, 1], patches[:, 2]
    fx, fy, cx, cy = [intrinsics[:, i, None, None] for i in range(4)]
    xn = (x - cx) / fx
    yn = (y - cy) / fy
    return jnp.stack([xn, yn, jnp.ones_like(d), d], axis=-1)


def proj(X, intrinsics, depth=False):
    """Pinhole projection of homogeneous points (E, P, P, 4) -> (E, P, P, 2).

    Z is clamped at 0.1 like the reference (ref projective_ops.py:43).
    """
    X, intrinsics = _f32(X), _f32(intrinsics)
    Z = X[..., 2]
    fx, fy, cx, cy = [intrinsics[:, i, None, None] for i in range(4)]
    d = 1.0 / jnp.maximum(Z, 0.1)
    x = fx * (d * X[..., 0]) + cx
    y = fy * (d * X[..., 1]) + cy
    if depth:
        return jnp.stack([x, y, d], axis=-1)
    return jnp.stack([x, y], axis=-1)


def transform(poses, patches, intrinsics, ii, jj, kk,
              depth=False, valid=False, jacobian=False, tonly=False,
              Gij=None):
    """Reproject patch kk from frame ii into frame jj.

    Returns coords (E, P, P, 2); optionally (coords, valid) or
    (coords, valid, (Ji, Jj, Jz)) with the central-pixel analytic Jacobians
    in the same form as the reference (ref projective_ops.py:53-113):
    Ji/Jj (E, 2, 6) wrt poses i/j (tangent order [tau, phi]), Jz (E, 2, 1)
    wrt patch inverse depth.

    Gij (E, 7) optional precomputed relative poses — the engine passes a
    per-frame-PAIR table gathered to edges (~300 pairs vs 45k edges at
    the retain bucket), skipping the per-edge se3_mul/inv chain.
    """
    poses, patches, intrinsics = _f32(poses), _f32(patches), _f32(intrinsics)

    X0 = iproj(patches[kk], intrinsics[ii])           # (E, P, P, 4)
    if Gij is None:
        Gij = lie.se3_mul(poses[jj], lie.se3_inv(poses[ii]))  # (E, 7)
    else:
        Gij = _f32(Gij)

    if tonly:
        Gij = Gij.at[..., 3:].set(
            jnp.array([0, 0, 0, 1.0], dtype=jnp.float32))

    X1 = lie.se3_act4(Gij[:, None, None], X0)         # (E, P, P, 4)
    x1 = proj(X1, intrinsics[jj], depth=depth)

    if jacobian:
        P = X1.shape[1]
        c = P // 2
        Xc = X1[:, c, c]                               # (E, 4)
        X, Y, Z, H = Xc[..., 0], Xc[..., 1], Xc[..., 2], Xc[..., 3]
        o = jnp.zeros_like(H)

        fx, fy = intrinsics[jj, 0], intrinsics[jj, 1]
        d = jnp.where(jnp.abs(Z) > 0.2, 1.0 / Z, 0.0)

        # Ja: d(X1)/d(xi_j) for the se3 action (ref :83-88), (E, 4, 6)
        Ja = jnp.stack([
            H, o, o, o, Z, -Y,
            o, H, o, -Z, o, X,
            o, o, H, Y, -X, o,
            o, o, o, o, o, o,
        ], axis=-1).reshape(-1, 4, 6)

        # Jp: projection Jacobian (ref :98-101), (E, 2, 4)
        Jp = jnp.stack([
            fx * d, o, -fx * X * d * d, o,
            o, fy * d, -fy * Y * d * d, o,
        ], axis=-1).reshape(-1, 2, 4)

        Jj_ = jnp.matmul(Jp, Ja, precision=_HI)                  # (E, 2, 6)
        Ji_ = -lie.se3_adjT(Gij[:, None], Jj_)                   # (E, 2, 6)
        Jz = jnp.matmul(Jp, lie.se3_matrix(Gij)[..., :, 3:],
                        precision=_HI)                            # (E, 2, 1)

        return x1, (Z > 0.2).astype(jnp.float32), (Ji_, Jj_, Jz)

    if valid:
        return x1, (X1[..., 2] > 0.2).astype(jnp.float32)

    return x1


def point_cloud(poses, patches, intrinsics, ix):
    """Lift patches to world-frame homogeneous points (ref :115-117).

    patches (K, 3, P, P), ix (K,) frame index -> (K, P, P, 4).
    """
    poses, patches, intrinsics = _f32(poses), _f32(patches), _f32(intrinsics)
    X0 = iproj(patches, intrinsics[ix])
    Ginv = lie.se3_inv(poses[ix])
    return lie.se3_act4(Ginv[:, None, None], X0)


def flow_mag(poses, patches, intrinsics, ii, jj, kk, beta=0.3):
    """Blend of full and translation-only flow magnitude (ref :120-130).

    Returns (flow (E, P, P), valid (E, P, P) bool).
    """
    coords0 = transform(poses, patches, intrinsics, ii, ii, kk)
    coords1, val = transform(poses, patches, intrinsics, ii, jj, kk,
                             valid=True)
    coords2 = transform(poses, patches, intrinsics, ii, jj, kk, tonly=True)

    flow1 = jnp.linalg.norm(coords1 - coords0, axis=-1)
    flow2 = jnp.linalg.norm(coords2 - coords0, axis=-1)

    return beta * flow1 + (1 - beta) * flow2, val > 0.5


# ---------------------------------------------------------------------------
# DROID-style dense-disparity ops (frame-graph construction for datasets;
# ref projective_ops.py:136-318)
# ---------------------------------------------------------------------------

def iproj_droid(disps, intrinsics):
    """Dense inverse projection. disps (E, H, W), intrinsics (E, 4)
    -> (E, H, W, 4)."""
    disps, intrinsics = _f32(disps), _f32(intrinsics)
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = [intrinsics[:, i, None, None] for i in range(4)]
    y, x = jnp.meshgrid(jnp.arange(ht, dtype=jnp.float32),
                        jnp.arange(wd, dtype=jnp.float32), indexing="ij")
    X = (x[None] - cx) / fx
    Y = (y[None] - cy) / fy
    return jnp.stack([X, Y, jnp.ones_like(disps), disps], axis=-1)


def proj_droid(Xs, intrinsics, return_depth=False):
    """Dense pinhole projection (ref :160-188)."""
    Xs, intrinsics = _f32(Xs), _f32(intrinsics)
    fx, fy, cx, cy = [intrinsics[:, i, None, None] for i in range(4)]
    X, Y, Z, D = [Xs[..., i] for i in range(4)]
    Z = jnp.where(Z < 0.5 * MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Z
    x = fx * (X * d) + cx
    y = fy * (Y * d) + cy
    if return_depth:
        return jnp.stack([x, y, D * d], axis=-1)
    return jnp.stack([x, y], axis=-1)


def projective_transform(poses, disps, intrinsics, ii, jj):
    """Dense map of points from frame ii -> jj (ref :271-304).

    poses (N, 7), disps (N, H, W), intrinsics (N, 4) -> coords (E, H, W, 2),
    valid (E, H, W, 1).
    """
    poses, disps, intrinsics = _f32(poses), _f32(disps), _f32(intrinsics)
    X0 = iproj_droid(disps[ii], intrinsics[ii])
    Gij = lie.se3_mul(poses[jj], lie.se3_inv(poses[ii]))
    # self-pairs get a fixed probe motion (ref :282-284)
    probe = jnp.array([-0.1, 0, 0, 0, 0, 0, 1.0], dtype=jnp.float32)
    Gij = jnp.where((ii == jj)[:, None], probe, Gij)
    X1 = lie.se3_act4(Gij[:, None, None], X0)
    x1 = proj_droid(X1, intrinsics[jj])
    valid = ((X1[..., 2] > MIN_DEPTH) & (X0[..., 2] > MIN_DEPTH))
    return x1, valid[..., None].astype(jnp.float32)


def induced_flow(poses, disps, intrinsics, ii, jj):
    """Optical flow induced by camera motion (ref :306-318)."""
    ht, wd = disps.shape[-2:]
    y, x = jnp.meshgrid(jnp.arange(ht, dtype=jnp.float32),
                        jnp.arange(wd, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.stack([x, y], axis=-1)
    coords1, valid = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid
