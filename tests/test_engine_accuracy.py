"""End-to-end engine accuracy on a synthetic scene with known GT.

An ORACLE update step replaces the learned network: it produces exact
GT reprojection targets (analytic plane scene + GT trajectory) with full
confidence, so the whole engine machinery — edge bookkeeping, ring
buffers, bundle adjustment scheduling, retirement, trajectory
interpolation in terminate() — must recover the ground-truth trajectory
to sub-pixel ATE.  This is the synthetic stand-in for the reference's
evaluate_* acceptance harnesses (ref evaluate_tartan.py:60-67), which
need datasets this image does not have (VERDICT r1 item 5).
"""
import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.config import VOConfig
from dpvo_tpu.engine import DPVO, kernels
from dpvo_tpu.ops import lie, projective as pops
from dpvo_tpu.utils.evaluation import ate_rmse

HT, WD = 64, 96
H, W = HT // 4, WD // 4
INTR = np.array([40.0, 40.0, W / 2.0, H / 2.0], np.float32)  # feature res
PLANE_Z = 4.0  # world plane z = const


def gt_trajectory(T):
    """Smooth forward motion with mild rotation; returns world-to-camera
    poses (T, 7) in the engine's convention."""
    xi = np.zeros((T, 6), np.float32)
    xi[:, 0] = 0.08 * np.arange(T)            # translate in x
    xi[:, 2] = 0.02 * np.sin(np.arange(T) * 0.4)
    xi[:, 4] = 0.01 * np.arange(T)            # slow yaw
    return np.asarray(jax.vmap(lie.se3_exp)(jnp.asarray(xi)))


def gt_inv_depth(pose_w2c, x, y):
    """Inverse depth of the world plane z=PLANE_Z seen from pose at
    feature pixels (x, y)."""
    fx, fy, cx, cy = INTR
    r = np.stack([(x - cx) / fx, (y - cy) / fy, np.ones_like(x)], -1)
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(pose_w2c[3:7])))
    t = pose_w2c[:3]
    # world point = R^T (lam*r - t); solve z-component == PLANE_Z
    denom = (R.T @ r.T)[2]
    num = PLANE_Z + (R.T @ t)[2]
    lam = num / np.where(np.abs(denom) > 1e-9, denom, 1e-9)
    return 1.0 / np.maximum(lam, 1e-3)


class OracleDPVO(DPVO):
    """DPVO with the learned update replaced by a GT-reprojection oracle."""

    def set_gt(self, poses_gt):
        self.gt_poses = poses_gt                       # (T, 7) w2c
        self.gt_depth = np.ones(self.N * self.M, np.float32)

    def _oracle_fill_depths(self):
        """GT inverse depth for the newest frame's patches (the engine
        increments n after writing slot n)."""
        n = max(self.n - 1, 0)
        sl = slice(n * self.M, (n + 1) * self.M)
        pat = np.asarray(self.ds.patches[sl])
        t = int(self.hs.tstamps[n])
        self.gt_depth[sl] = gt_inv_depth(
            self.gt_poses[t], pat[:, 0, 1, 1], pat[:, 1, 1, 1])

    def _gt_buffers(self):
        """Engine-indexed GT poses + GT-depth patches."""
        N = self.N
        tmap = np.clip(self.hs.tstamps[:N], 0, len(self.gt_poses) - 1)
        poses_gt_buf = self.gt_poses[tmap]
        patches_gt = np.array(self.ds.patches)
        patches_gt[:, 2] = self.gt_depth[:, None, None]
        return jnp.asarray(poses_gt_buf), jnp.asarray(patches_gt)

    def _call_update_step(self, ds, bucket, t0, t1, run_ba, mm_blob=None):
        from dpvo_tpu.ops import ba as ba_ops
        gt_poses_buf, gt_patches = self._gt_buffers()
        hs = self.hs
        e = hs.e_num
        ii_d = jnp.asarray(np.where(np.arange(bucket) < e,
                                    hs.ii[:bucket], 0), jnp.int32)
        jj_d = jnp.asarray(np.where(np.arange(bucket) < e,
                                    hs.jj[:bucket], 0), jnp.int32)
        kk_d = jnp.asarray(np.where(np.arange(bucket) < e,
                                    hs.kk[:bucket], 0), jnp.int32)
        valid = jnp.asarray(np.arange(bucket) < e)
        ii_s = jnp.where(valid, ii_d, 0)
        jj_s = jnp.where(valid, jj_d, 0)
        kk_s = jnp.where(valid, kk_d, 0)
        coords = pops.transform(gt_poses_buf, gt_patches, ds.intrinsics,
                                ii_s, jj_s, kk_s)
        target = jnp.where(valid[:, None], coords[:, 1, 1], 0.0)
        weight = jnp.where(valid[:, None], 1.0, 0.0)

        poses, patches = ds.poses, ds.patches
        if run_ba:
            poses, patches = ba_ops.ba_iterative(
                poses, patches, ds.intrinsics[0], target, weight,
                jnp.float32(1e-4), ii_s, jj_s, kk_s, valid, t0, t1,
                n_cap=self.n_cap, k_cap=self.k_cap, iterations=4)
        E = target.shape[0]
        net_tab = ds.net
        target_tab = ds.target.at[:E].set(target)
        weight_tab = ds.weight.at[:E].set(weight)
        mag = None
        if mm_blob is not None:
            mag = kernels.flowmag_two_blob(poses, patches, ds.intrinsics,
                                           mm_blob,
                                           cap=len(mm_blob) // 8)
        return (net_tab, target_tab, weight_tab,
                jnp.zeros((E, 2)), poses, patches, mag)

    def __call__(self, t, image, intrinsics):
        super().__call__(t, image, intrinsics)
        self._oracle_fill_depths()


def _run_oracle(T, async_kf, thresh):
    cfg = VOConfig(BUFFER_SIZE=32, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=16,
                   OPTIMIZATION_WINDOW=10, PATCH_LIFETIME=8,
                   KEYFRAME_INDEX=2, KEYFRAME_THRESH=thresh,
                   MIXED_PRECISION=False, EDGE_CAPACITY=2048,
                   BA_WINDOW_CAP=16, LOOP_CLOSURE=False,
                   ASYNC_KEYFRAME=async_kf,
                   # deterministic merge timing for the A/B (decisions
                   # otherwise apply whenever the reader thread lands)
                   ASYNC_KEYFRAME_LAG=1)
    slam = OracleDPVO(cfg, network=None, ht=HT, wd=WD)
    slam.motion_probe = lambda: 100.0
    poses_gt = gt_trajectory(T)
    slam.set_gt(poses_gt)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (HT, WD, 3), np.uint8)
    for t in range(T):
        slam(t, img, INTR * 4.0)
    n_merges = len(slam.hs.delta)
    est, _ = slam.terminate()
    gt_c2w = np.asarray(jax.vmap(lie.se3_inv)(jnp.asarray(poses_gt)))
    return est, gt_c2w, n_merges


def test_async_keyframe_accuracy_delta():
    """VERDICT r1 item 4: measure the accuracy effect of ASYNC_KEYFRAME
    (keyframe merges applied ``lag``=3 frames late vs the reference's
    synchronous check, ref dpvo.py:266-268) on the oracle GT scene.

    MEASURED (T=16, merge-every-frame, span 1.20): sync ATE 0.0361,
    async ATE 0.0007.  The lag is an accuracy IMPROVEMENT in this
    regime, not a cost: deferred merges keep 3 extra frames of parallax
    in the optimization window, and the last ``lag`` merges before
    terminate() never apply at all, so late-trajectory geometry stays
    un-collapsed.  The asserted contract is therefore one-sided — the
    async path must never be meaningfully WORSE than the synchronous
    reference timing.  Numbers recorded in docs/PERF.md.
    """
    T = 16
    est_sync, gt_c2w, merges_sync = _run_oracle(T, False, 1e9)
    est_async, _, merges_async = _run_oracle(T, True, 1e9)

    # merges actually happened in both runs (the regime under test)
    assert merges_sync > 0 and merges_async > 0

    span = np.linalg.norm(gt_c2w[-1, :3] - gt_c2w[0, :3])
    ate_sync = ate_rmse(est_sync, gt_c2w, correct_scale=True)
    ate_async = ate_rmse(est_async, gt_c2w, correct_scale=True)

    # both modes recover GT (merging EVERY keyframe discards real
    # parallax, so the bound is looser than the retire-only test below:
    # measured sync ATE 0.036 on span 1.20)
    assert ate_sync < 0.05 * span, (ate_sync, span)
    assert ate_async < 0.05 * span, (ate_async, span)
    # one-sided: the async lag must not cost accuracy vs sync timing
    assert ate_async < ate_sync + 5e-3 * span, (
        ate_sync, ate_async, span)


def test_engine_recovers_gt_trajectory():
    T = 14
    cfg = VOConfig(BUFFER_SIZE=32, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=16,
                   OPTIMIZATION_WINDOW=10, PATCH_LIFETIME=8,
                   KEYFRAME_INDEX=2, KEYFRAME_THRESH=0.0,
                   MIXED_PRECISION=False, EDGE_CAPACITY=2048,
                   BA_WINDOW_CAP=16, LOOP_CLOSURE=False)
    slam = OracleDPVO(cfg, network=None, ht=HT, wd=WD)
    slam.motion_probe = lambda: 100.0
    poses_gt = gt_trajectory(T)
    slam.set_gt(poses_gt)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (HT, WD, 3), np.uint8)
    for t in range(T):
        slam(t, img, INTR * 4.0)  # engine divides by RES=4

    est, tstamps = slam.terminate()
    assert est.shape[0] == T
    # engine returns camera-to-world (inverted) trajectories
    gt_c2w = np.asarray(jax.vmap(lie.se3_inv)(jnp.asarray(poses_gt)))
    err = ate_rmse(est, gt_c2w, correct_scale=True)
    # GT targets + exact BA: trajectory must match to small ATE
    # (scale-aligned; oracle depth + GN tolerance)
    span = np.linalg.norm(gt_c2w[-1, :3] - gt_c2w[0, :3])
    assert err < 0.02 * span, (err, span)
