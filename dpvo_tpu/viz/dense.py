"""Dense depth-filtered backprojection for the viewer.

JAX rebuild of DPViewer's ``backproject_and_filter`` CUDA kernel (ref
modules/DPViewer/dpviewer/viewer_cuda.cu:56-199): backproject every pixel
of one keyframe's dense inverse-depth map, reject depth-discontinuity
pixels (disparity-gradient > 0.01), and keep only points whose depth is
consistent when reprojected into the other keyframes
(``100*(max(z1/z2, z2/z1)-1) < thresh`` votes, cu:153-160).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import lie


@partial(jax.jit, static_argnames=("scale",))
def backproject_and_filter(images, poses, disps, intrinsics, index,
                           thresh=2.0, scale=8, min_count=2):
    """Dense consistency-filtered point cloud of one keyframe.

    images     (N, H*scale, W*scale, 3) uint8 (full-res, for colors)
    poses      (N, 7) world-to-camera (engine convention)
    disps      (N, H, W) dense inverse depth at 1/scale resolution
    intrinsics (N, 4) at 1/scale resolution (the CUDA kernel multiplies
               by 8, cu:80; here the caller passes matching-res values
               and ``scale`` only picks color pixels)
    index      int32 keyframe to backproject
    -> (points (H*W, 3) world coords, colors (H*W, 3) uint8,
        keep (H*W,) bool)
    """
    N, H, W = disps.shape
    fx, fy, cx, cy = [intrinsics[index, i] for i in range(4)]

    i, j = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    d = disps[index]

    # depth-discontinuity rejection (cu:104-109)
    dxs = jnp.pad(d[:, 1:] - d[:, :-1], ((0, 0), (0, 1)))
    dys = jnp.pad(d[1:, :] - d[:-1, :], ((0, 1), (0, 0)))
    smooth = jnp.sqrt(dxs ** 2 + dys ** 2) <= 0.01
    interior = (i < H - 1) & (j < W - 1)

    X0 = jnp.stack([(j - cx) / fx, (i - cy) / fy,
                    jnp.ones_like(d), d], axis=-1).reshape(-1, 4)

    inv_pose = lie.se3_inv(poses[index])
    Xw = jax.vmap(lie.se3_act4, in_axes=(None, 0))(inv_pose, X0)
    points = Xw[:, :3] / jnp.maximum(Xw[:, 3:4], 1e-8)[..., 0][:, None]

    # colors from the full-res image, BGR -> RGB (cu:122-124)
    ii = (i * scale).astype(jnp.int32)
    jj = (j * scale).astype(jnp.int32)
    colors = images[index][ii, jj][..., ::-1].reshape(-1, 3)

    # multi-view depth-consistency votes (cu:127-160)
    def votes_for_frame(pose_jx, disps_jx, intr_jx):
        Xc = jax.vmap(lie.se3_act4, in_axes=(None, 0))(pose_jx, Xw)
        z2 = Xc[:, 3] / jnp.maximum(Xc[:, 2], 1e-8)
        x1 = intr_jx[0] * (Xc[:, 0] / jnp.maximum(Xc[:, 2], 1e-8)) \
            + intr_jx[2]
        y1 = intr_jx[1] * (Xc[:, 1] / jnp.maximum(Xc[:, 2], 1e-8)) \
            + intr_jx[3]
        i1 = jnp.round(y1).astype(jnp.int32)
        j1 = jnp.round(x1).astype(jnp.int32)
        ok = ((i1 >= 0) & (i1 < H) & (j1 >= 0) & (j1 < W)
              & (d.reshape(-1) > 0.1) & (Xc[:, 2] > 1e-8))
        z1 = disps_jx[jnp.clip(i1, 0, H - 1), jnp.clip(j1, 0, W - 1)]
        ratio = jnp.maximum(z1 / jnp.maximum(z2, 1e-8),
                            z2 / jnp.maximum(z1, 1e-8))
        return (ok & (100.0 * (ratio - 1.0) < thresh)).astype(jnp.int32)

    votes = jax.vmap(votes_for_frame)(poses, disps, intrinsics)
    not_self = (jnp.arange(N) != index).astype(jnp.int32)
    count = jnp.sum(votes * not_self[:, None], axis=0)

    keep = (smooth & interior).reshape(-1) & (count >= min_count)
    return points, colors, keep
