"""Classic long-term loop closure: place recognition + Sim3 PGO.

Rebuild of the reference's LongTermLoopClosure (ref long_term.py:20-266):
every frame feeds the BoW retrieval process and the JPEG cache; on a
confirmed retrieval hit, 3D keypoints are triangulated for both loop ends
from cached frame triplets (keypoint matching + structure-only bundle
adjustment), a relative Sim3 is estimated with RANSAC-Umeyama, and a Sim3
pose-graph optimization runs in a worker process whose result is merged
back on the next ``lc_callback``.

Dependency-free keypoint path standing in for the reference's DISK +
LightGlue (kornia, not in this image): SIFT + ratio-test BFMatcher by
default (cfg.LOOP_MATCHER="sift"), ORB + Hamming as the fast fallback
("orb").  The rest of the pipeline is structurally identical.  On the
synthetic-revisit benchmark (scripts/dev/lc_match_bench.py, median of
3 seeds) SIFT produces 385 RANSAC inliers at a 99% inlier rate and
recovers the drift Sim3 to 0.013 deg / 1.2e-3 t / 0.015% scale —
1.7x the usable constraints of even a ground-truth matcher running on
ORB keypoints (224 inliers), whose accuracy is limited by ORB's
keypoint localization, and ~100x tighter than the shipped-in-r3 ORB
path (1.27 deg / 0.11 / 0.60%).
"""
from __future__ import annotations

import multiprocessing as mp

import numpy as np
import jax.numpy as jnp

from ..ops import lie, ba
from .optim_utils import ransac_umeyama, make_sim3
from .pgo import run_pgo
from .retrieval.retrieval_dbow import RetrievalDBOW, _orb_descriptors
from .retrieval.image_cache import ImageCache


def _sift_descriptors(image, n_features=1024):
    """SIFT keypoints + float descriptors (the high-recall default)."""
    import cv2
    gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY) \
        if image.ndim == 3 else image
    sift = cv2.SIFT_create(nfeatures=n_features)
    kps, descs = sift.detectAndCompute(gray, None)
    if descs is None:
        descs = np.zeros((0, 128), np.float32)
    pts = np.array([k.pt for k in kps], np.float32).reshape(-1, 2)
    return pts, descs


def _match(d1, d2, ratio=0.8):
    """BFMatcher with ratio test -> index pairs (m, 2).  Norm follows
    the descriptor dtype: Hamming for binary (ORB), L2 for float
    (SIFT)."""
    import cv2
    if len(d1) == 0 or len(d2) == 0:
        return np.zeros((0, 2), np.int32)
    norm = cv2.NORM_HAMMING if d1.dtype == np.uint8 else cv2.NORM_L2
    bf = cv2.BFMatcher(norm)
    knn = bf.knnMatch(d1, d2, k=2)
    out = []
    for m in knn:
        if len(m) == 2 and m[0].distance < ratio * m[1].distance:
            out.append((m[0].queryIdx, m[0].trainIdx))
        elif len(m) == 1:
            out.append((m[0].queryIdx, m[0].trainIdx))
    return np.array(out, np.int32).reshape(-1, 2)


class LongTermLoopClosure:
    def __init__(self, cfg, slam):
        self.cfg = cfg
        self.slam = slam
        self.retrieval = RetrievalDBOW(
            thresh=cfg.LOOP_RETR_THRESH,
            vocab_path=getattr(cfg, "LOOP_VOCAB_PATH", "") or None)
        self.imcache = ImageCache()
        kind = getattr(cfg, "LOOP_MATCHER", "sift")
        self._detect = (_sift_descriptors if kind == "sift"
                        else _orb_descriptors)

        ctx = mp.get_context("spawn")
        self.result_queue = ctx.Queue()
        self.pool = ctx.Pool(1)
        self.pending = 0

    # --- per-frame feeds (ref long_term.py:61-68) -------------------------

    def __call__(self, image, n):
        self.retrieval(image, n)
        self.imcache(image, n)

    def keyframe(self, k):
        self.retrieval.keyframe(k)
        self.imcache.keyframe(k)

    # --- keypoint triangulation (ref long_term.py:70-138) ------------------

    def estimate_3d_keypoints(self, i):
        """Triangulate keypoints of keyframe i from a cached triplet via
        structure-only BA against the engine's current poses."""
        import cv2
        slam = self.slam
        orig = [self.imcache.original_index(j)
                for j in (max(i - 1, 0), i, min(i + 1, slam.n - 1))]
        frames = self.imcache.load_frames(orig)
        if any(f is None for f in frames):
            return None

        kps, descs = [], []
        for f in frames:
            p, d = self._detect(f, n_features=1024)
            kps.append(p)
            descs.append(d)

        m01 = _match(descs[1], descs[0])
        m12 = _match(descs[1], descs[2])
        # keypoints of frame i seen in both neighbors
        common = np.intersect1d(m01[:, 0], m12[:, 0])
        if len(common) < 8:
            return None
        sel01 = {a: b for a, b in m01}
        sel12 = {a: b for a, b in m12}

        # mini patch graph: patch k = keypoint k of frame i; edges to the
        # two neighbors with targets at the matched locations
        K = len(common)
        RES = slam.RES
        P = slam.P
        pts_c = kps[1][common] / RES
        patches = np.zeros((K, 3, P, P), np.float32)
        patches[:, 0] = pts_c[:, 0, None, None]
        patches[:, 1] = pts_c[:, 1, None, None]
        patches[:, 2] = 1.0

        fids = [max(i - 1, 0), i, min(i + 1, slam.n - 1)]
        ii_l, jj_l, kk_l, tgt = [], [], [], []
        for k, c in enumerate(common):
            for fslot, mm, kp in ((0, sel01, kps[0]), (2, sel12, kps[2])):
                j = mm[int(c)]
                ii_l.append(1)
                jj_l.append(fslot)
                kk_l.append(k)
                tgt.append(kp[j] / RES)
        E = len(ii_l)
        poses3 = np.asarray(slam.ds.poses)[fids]
        intr = np.asarray(slam.ds.intrinsics)[i]

        ii = jnp.asarray(np.array(ii_l), jnp.int32)
        jj = jnp.asarray(np.array(jj_l), jnp.int32)
        kk = jnp.asarray(np.array(kk_l), jnp.int32)
        k_cap = 1 << int(np.ceil(np.log2(max(K, 16))))

        # structure-only BA: t0 == t1 -> depth-only updates
        # (ref long_term.py:124-125 uses fastba.BA with 6 iterations)
        _, patches_opt = ba.ba_iterative(
            jnp.asarray(poses3), jnp.asarray(patches), jnp.asarray(intr),
            jnp.asarray(np.array(tgt, np.float32)),
            jnp.ones((E, 2), jnp.float32), jnp.float32(1e-4),
            ii, jj, kk, jnp.ones((E,), bool),
            jnp.int32(3), jnp.int32(3), n_cap=4, k_cap=k_cap,
            iterations=6)

        # lift to world points
        from ..ops import projective as pops
        X = pops.point_cloud(jnp.asarray(poses3),
                             patches_opt, jnp.asarray(intr)[None].repeat(3, 0),
                             jnp.ones((K,), jnp.int32))
        ctr = np.asarray(X[:, P // 2, P // 2])
        pts3d = ctr[:, :3] / np.maximum(ctr[:, 3:], 1e-8)
        return pts3d, descs[1][common]

    # --- the loop-closure event (ref long_term.py:205-266) -----------------

    def close_loop(self, i, j):
        res_i = self.estimate_3d_keypoints(i)
        res_j = self.estimate_3d_keypoints(j)
        if res_i is None or res_j is None:
            return False
        pts_i, d_i = res_i
        pts_j, d_j = res_j

        m = _match(d_i, d_j)
        if len(m) < 8:
            return False
        src = pts_i[m[:, 0]]
        dst = pts_j[m[:, 1]]

        R, t, s, inliers = ransac_umeyama(src, dst, iterations=400,
                                          threshold=0.1)
        if R is None or inliers < 8:
            return False

        dS = make_sim3(R, t, s)
        poses = np.asarray(self.slam.ds.poses)[:self.slam.n].copy()
        loop_ii = np.array([max(i, j)], np.int64)
        loop_jj = np.array([min(i, j)], np.int64)

        self.pool.apply_async(
            run_pgo, (poses, dS[None], loop_ii, loop_jj,
                      self.result_queue))
        self.pending += 1
        return True

    def attempt_loop_closure(self, n):
        hit = self.retrieval.detect_loop()
        if hit is not None:
            i, j = hit
            if 0 <= j < self.slam.n and 0 <= i < self.slam.n and i != j:
                self.close_loop(i, j)

    def lc_callback(self):
        """Merge PGO results (ref long_term.py:189-203): rewrite poses,
        rescale patch depths and delta chains, renormalize."""
        while not self.result_queue.empty():
            corrected = self.result_queue.get()  # (m, 8) Sim3
            self.pending -= 1
            slam = self.slam
            m = min(len(corrected), slam.n)
            sim = jnp.asarray(corrected[:m])
            scales = np.asarray(sim[:, 7])
            se3 = np.asarray(lie.sim3_to_se3(sim))
            # renormalize quaternion part, fold scale into depths
            poses = np.asarray(slam.ds.poses)
            poses[:m] = se3
            slam.ds.poses = jnp.asarray(poses)

            patches = np.asarray(slam.ds.patches)
            M = slam.M
            for f in range(m):
                patches[f * M:(f + 1) * M, 2] /= max(scales[f], 1e-8)
            slam.ds.patches = jnp.asarray(patches)
            slam.normalize()

    def terminate(self, n):
        self.attempt_loop_closure(n)
        # wait for outstanding PGO results
        import time
        t0 = time.time()
        while self.pending > 0 and time.time() - t0 < 30.0:
            self.lc_callback()
            time.sleep(0.1)
        self.lc_callback()
        self.retrieval.close()
        self.imcache.close()
        self.pool.close()
        self.pool.join()
