"""RGB-D dataset utilities: TUM loading, pose distances, flow-based
co-visibility (ref dpvo/data_readers/rgbd_utils.py).

The pairwise induced-flow evaluation runs as a batched jitted JAX function
on whatever backend is available (the reference required a CUDA GPU for
this preprocessing step)."""
from __future__ import annotations

import os.path as osp

import numpy as np

from ..ops import lie


def parse_list(filepath, skiprows=0):
    return np.loadtxt(filepath, delimiter=" ", dtype=str,
                      skiprows=skiprows)


def associate_frames(tstamp_image, tstamp_depth, tstamp_pose,
                     max_dt=1.0):
    """Timestamp association (ref rgbd_utils.py:17-33)."""
    associations = []
    for i, t in enumerate(tstamp_image):
        if tstamp_pose is None:
            j = np.argmin(np.abs(tstamp_depth - t))
            if np.abs(tstamp_depth[j] - t) < max_dt:
                associations.append((i, j))
        else:
            j = np.argmin(np.abs(tstamp_depth - t))
            k = np.argmin(np.abs(tstamp_pose - t))
            if (np.abs(tstamp_depth[j] - t) < max_dt) and \
                    (np.abs(tstamp_pose[k] - t) < max_dt):
                associations.append((i, j, k))
    return associations


def loadtum(datapath, frame_rate=-1):
    """Load a TUM-format RGB-D sequence (ref rgbd_utils.py:36-89)."""
    if osp.isfile(osp.join(datapath, 'groundtruth.txt')):
        pose_list = osp.join(datapath, 'groundtruth.txt')
    elif osp.isfile(osp.join(datapath, 'pose.txt')):
        pose_list = osp.join(datapath, 'pose.txt')
    else:
        return None, None, None, None

    image_list = osp.join(datapath, 'rgb.txt')
    depth_list = osp.join(datapath, 'depth.txt')

    image_data = parse_list(image_list, skiprows=1)
    depth_data = parse_list(depth_list, skiprows=1)
    pose_data = parse_list(pose_list, skiprows=1)
    pose_vecs = pose_data[:, 1:].astype(np.float64)

    tstamp_image = image_data[:, 0].astype(np.float64)
    tstamp_depth = depth_data[:, 0].astype(np.float64)
    tstamp_pose = pose_data[:, 0].astype(np.float64)
    associations = associate_frames(tstamp_image, tstamp_depth, tstamp_pose)

    # reduce to target frame rate
    indices = [0]
    for i in range(1, len(associations)):
        t0 = tstamp_image[associations[indices[-1]][0]]
        t1 = tstamp_image[associations[i][0]]
        if frame_rate < 0 or t1 - t0 > 1.0 / frame_rate:
            indices.append(i)

    images, poses, depths, tstamps = [], [], [], []
    for ix in indices:
        (i, j, k) = associations[ix]
        images.append(osp.join(datapath, image_data[i, 1]))
        depths.append(osp.join(datapath, depth_data[j, 1]))
        poses.append(pose_vecs[k])
        tstamps.append(tstamp_image[i])
    return images, depths, poses, tstamps


def all_pairs_distance_matrix(poses, beta=2.5):
    """Approximate pose distance (ref rgbd_utils.py:92-103)."""
    poses = np.array(poses, np.float64)
    # translation term + rotation term via relative poses
    import jax.numpy as jnp
    g = jnp.asarray(poses, jnp.float32)
    rel = lie.se3_mul(lie.se3_inv(g[:, None]), g[None, :])
    t = np.asarray(jnp.linalg.norm(rel[..., :3], axis=-1))
    phi = np.asarray(jnp.linalg.norm(lie.se3_log(rel)[..., 3:], axis=-1))
    return t + beta * phi


def compute_distance_matrix_flow(poses, disps, intrinsics,
                                 batch_pairs=2048):
    """Mean induced flow between all frame pairs (ref rgbd_utils.py:106-147).

    poses (N, 7), disps (N, h, w) subsampled, intrinsics (4,) or (N, 4).
    Pairs with <70% valid pixels get infinite distance.
    """
    import jax
    import jax.numpy as jnp
    from ..ops import projective as pops

    N = poses.shape[0]
    poses_j = jnp.asarray(poses, jnp.float32)
    disps_j = jnp.asarray(disps, jnp.float32)
    intr = np.asarray(intrinsics, np.float32)
    if intr.ndim == 1:
        intr = np.tile(intr[None], (N, 1))
    intr_j = jnp.asarray(intr)

    ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)

    @jax.jit
    def flow_batch(ii_b, jj_b):
        flow, val = pops.induced_flow(poses_j, disps_j, intr_j, ii_b, jj_b)
        mag = jnp.linalg.norm(flow, axis=-1)          # (B, h, w)
        val = val[..., 0]
        frac = val.mean(axis=(1, 2))
        mean_mag = (mag * val).sum(axis=(1, 2)) / \
            jnp.maximum(val.sum(axis=(1, 2)), 1.0)
        return jnp.where(frac > 0.7, mean_mag, jnp.inf)

    out = np.full((N * N,), np.inf, np.float32)
    for s in range(0, len(ii), batch_pairs):
        e = min(s + batch_pairs, len(ii))
        pad = batch_pairs - (e - s)
        ib = np.concatenate([ii[s:e], np.zeros(pad, np.int64)])
        jb = np.concatenate([jj[s:e], np.zeros(pad, np.int64)])
        res = np.asarray(flow_batch(jnp.asarray(ib), jnp.asarray(jb)))
        out[s:e] = res[:e - s]

    d = out.reshape(N, N)
    # symmetrize like the reference (max of both directions)
    return np.maximum(d, d.T)
