"""Viewer components: dense filtered backprojection + frusta geometry."""
import numpy as np
import jax
import jax.numpy as jnp

from dpvo_tpu.ops import lie
from dpvo_tpu.viz.dense import backproject_and_filter
from dpvo_tpu.viz.viewer import _frustum_segments


def test_backproject_consistent_plane():
    """A fronto-parallel plane seen by several cameras must survive the
    consistency filter; noise-corrupted depths must be rejected
    (ref viewer_cuda.cu:56-160 semantics)."""
    N, H, W, scale = 4, 12, 16, 4
    fx = fy = 20.0
    cx, cy = W / 2.0, H / 2.0
    intr = np.tile(np.array([fx, fy, cx, cy], np.float32), (N, 1))

    # cameras translated in x, all looking at plane z=5
    xi = np.zeros((N, 6), np.float32)
    xi[:, 0] = 0.1 * np.arange(N)
    poses = np.asarray(jax.vmap(lie.se3_exp)(jnp.asarray(xi)))  # w2c

    # dense GT inverse depth of the plane for each camera: z_cam = 5
    # (fronto-parallel, no rotation) -> disp = 1/5
    disps = np.full((N, H, W), 0.2, np.float32)
    images = np.random.default_rng(0).integers(
        0, 255, (N, H * scale, W * scale, 3), np.uint8)

    pts, cols, keep = backproject_and_filter(
        jnp.asarray(images), jnp.asarray(poses), jnp.asarray(disps),
        jnp.asarray(intr), jnp.int32(0), thresh=2.0, scale=scale,
        min_count=2)
    keep = np.asarray(keep)
    pts = np.asarray(pts)
    assert keep.sum() > 0.5 * H * W          # most of the plane survives
    # surviving points lie on the plane z=5 (camera 0 at origin)
    np.testing.assert_allclose(pts[keep][:, 2], 5.0, atol=1e-3)

    # corrupt frame 0's depth -> consistency votes vanish
    disps_bad = disps.copy()
    disps_bad[0] *= 3.0
    _, _, keep_bad = backproject_and_filter(
        jnp.asarray(images), jnp.asarray(poses), jnp.asarray(disps_bad),
        jnp.asarray(intr), jnp.int32(0), thresh=2.0, scale=scale,
        min_count=2)
    assert np.asarray(keep_bad).sum() == 0


def test_frustum_segments_shape():
    pose = np.zeros(7, np.float32)
    pose[6] = 1.0
    segs = _frustum_segments(pose)
    assert len(segs) == 8
    for s in segs:
        assert s.shape == (2, 3)
        assert np.isfinite(s).all()


def test_export_html(tmp_path):
    from dpvo_tpu.viz.html_map import export_html
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (500, 3)).astype(np.uint8)
    cams = rng.normal(size=(10, 3)).astype(np.float32)
    segs = [np.zeros((2, 3), np.float32)] * 4
    path = export_html(str(tmp_path / "map.html"), pts, cols, cams, segs)
    html = open(path).read()
    assert "dpvo_tpu map" in html and "PTS" in html
    assert html.count("[") >= 3  # embedded arrays
    # NaN points must be dropped, not serialized
    pts[0] = np.nan
    export_html(str(tmp_path / "m2.html"), pts, cols, cams, segs)
    assert "NaN" not in open(str(tmp_path / "m2.html")).read()
