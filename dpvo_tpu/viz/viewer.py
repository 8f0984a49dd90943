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

import numpy as np


def _frustum_segments(pose_c2w, size=0.12):
    """Wireframe camera frustum line segments in world coords.

    pose_c2w: (7,) camera-to-world xyz+quat.  Returns a list of (2, 3)
    segments (8 frustum edges), the analog of DPViewer's per-camera
    frustum (viewer_cuda.cu:142-199 poseToMatrix + Pangolin draw).
    """
    from ..ops import lie
    import jax
    import jax.numpy as jnp

    w, h, z = size, 0.75 * size, 1.6 * size
    corners = np.array([[w, h, z], [w, -h, z], [-w, -h, z], [-w, h, z]],
                       np.float32)
    pts = np.concatenate([np.zeros((1, 3), np.float32), corners])
    world = np.asarray(jax.vmap(lie.se3_act, in_axes=(None, 0))(
        jnp.asarray(pose_c2w), jnp.asarray(pts)))
    apex, c = world[0], world[1:]
    segs = [np.stack([apex, c[k]]) for k in range(4)]
    segs += [np.stack([c[k], c[(k + 1) % 4]]) for k in range(4)]
    return segs


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
        # camera trajectory + wireframe frusta (ref viewer_cuda.cu's
        # poseToMatrix kernel feeding Pangolin's frustum draw, :142-199)
        from ..ops import lie
        import jax
        import jax.numpy as jnp
        inv = np.asarray(jax.vmap(lie.se3_inv)(jnp.asarray(poses)))
        cams = inv[:, :3]
        ax.plot(cams[:, 0], cams[:, 2], -cams[:, 1], "r-", lw=1)
        for k in range(0, n, max(n // 12, 1)):
            for seg in _frustum_segments(inv[k]):
                ax.plot(seg[:, 0], seg[:, 2], -seg[:, 1], "g-", lw=0.5)
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
            self._export_html()
        except Exception:
            pass

    def _export_html(self):
        """Interactive 3D map (stand-in for DPViewer's Pangolin window
        on headless TPU VMs): drag-to-orbit HTML with points, trajectory
        and frusta embedded."""
        import jax
        import jax.numpy as jnp
        from ..ops import lie
        from .html_map import export_html

        slam = self.slam
        n, m = slam.n, slam.m
        if n < 2:
            return
        pts = np.asarray(slam.points[:m])
        cols = np.asarray(slam.ds.colors[:n]).reshape(-1, 3)[:m][:, ::-1]
        inv = np.asarray(jax.vmap(lie.se3_inv)(
            jnp.asarray(slam.ds.poses[:n])))
        segs = []
        for k in range(0, n, max(n // 24, 1)):
            segs += _frustum_segments(inv[k])
        with self._lock:
            img = self._image
        export_html(os.path.join(self.out_dir, "map.html"),
                    pts, cols, inv[:, :3], segs, image=img)
