"""Background 3D map viewer.

Functional rebuild of the reference's DPViewer (ref
modules/DPViewer/dpviewer/viewer.cpp: a Pangolin/OpenGL thread with
CUDA-GL zero-copy VBOs).  TPU VMs are headless, so instead of an OpenGL
window this viewer runs in a daemon thread and periodically renders the
current point cloud + camera trajectory + latest video frame into PNG
snapshots (matplotlib Agg) under ``out_dir``, which a user can watch with
any file viewer / web server.  The engine-facing API matches the
reference: ``Viewer(slam)``, ``update_image(image)``, ``join()``.
"""
from __future__ import annotations

import os
import threading
import time

import numpy as np


class Viewer:
    def __init__(self, slam, out_dir="viewer_out", period=2.0):
        self.slam = slam
        self.out_dir = out_dir
        self.period = period
        os.makedirs(out_dir, exist_ok=True)

        self._image = None
        self._lock = threading.Lock()   # image handoff (ref viewer.cpp:37)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self._counter = 0

    def update_image(self, image):
        with self._lock:
            self._image = np.asarray(image).copy()

    def _render(self):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return

        slam = self.slam
        n, m = slam.n, slam.m
        if n < 2:
            return
        poses = np.asarray(slam.ds.poses[:n])
        points = np.asarray(slam.points[:m])
        colors = np.asarray(slam.ds.colors[:n]).reshape(-1, 3)[:m]

        ok = np.isfinite(points).all(axis=1)
        ok &= np.linalg.norm(points, axis=1) < 50.0
        pts = points[ok]
        cls = colors[ok] / 255.0

        fig = plt.figure(figsize=(10, 5))
        ax = fig.add_subplot(121, projection="3d")
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1], s=0.5,
                       c=cls[:, ::-1])
        # camera centers: inverse poses' translations
        from ..ops import lie
        import jax.numpy as jnp
        cams = np.asarray(lie.se3_inv(jnp.asarray(poses)))[:, :3]
        ax.plot(cams[:, 0], cams[:, 2], -cams[:, 1], "r-", lw=1)
        ax.set_title(f"map (n={n}, pts={len(pts)})")

        ax2 = fig.add_subplot(122)
        with self._lock:
            img = self._image
        if img is not None:
            ax2.imshow(img[..., ::-1])
        ax2.axis("off")
        ax2.set_title("current frame")

        fig.savefig(os.path.join(self.out_dir, "latest.png"), dpi=80)
        plt.close(fig)
        self._counter += 1

    def _loop(self):
        while not self._stop.is_set():
            try:
                self._render()
            except Exception:
                pass
            self._stop.wait(self.period)

    def join(self):
        """Final render + stop (ref viewer joins its thread on terminate)."""
        self._stop.set()
        self._thread.join(timeout=5.0)
        try:
            self._render()
        except Exception:
            pass
