"""Host-plane coverage (VERDICT r2 weak#6/#7): frame producers,
image-cache keyframe remapping, HTML map export content, and the
non-tartan eval harness parsers on synthetic on-disk data.

Reference behaviors mirrored:
- stream producers: undistort when calib has >4 params, /16 crop,
  video path halves resolution+intrinsics, sentinel (-1, None, None)
  terminates (ref methods/dpvo/dpvo/stream.py:26-38,44-89)
- ImageCache: frames submitted under engine indices stay loadable
  after keyframe(k) merges via the remap
  (ref dpvo/loop_closure/retrieval/image_cache.py:52-58)
- eval harness parsers: EuRoC state-groundtruth csv, KITTI P0 +
  pose files, TUM rgb.txt/groundtruth.txt association, ICL scene glob
  (ref methods/dpvo/evaluate_{euroc,kitti,tum,icl_nuim}.py)
"""
import os
import os.path as osp
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


# ---------------------------------------------------------------- streams

def _drain(queue, proc, limit=100):
    out = []
    for _ in range(limit):
        t, img, intr = queue.get(timeout=60)
        if t < 0:
            break
        out.append((t, img, intr))
    proc.join(timeout=30)
    return out


def _write_images(d, n, h=70, w=100):
    rng = np.random.default_rng(3)
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(osp.join(d, f"{i:04d}.png"), img)


def test_image_stream_crop_stride_skip_sentinel(tmp_path):
    from dpvo_tpu.data.stream import spawn_stream

    d = tmp_path / "imgs"
    d.mkdir()
    _write_images(str(d), 7)                      # 70x100 -> crop 64x96
    calib = tmp_path / "calib.txt"
    np.savetxt(calib, np.array([[90.0, 90.0, 50.0, 35.0]]))

    q, proc = spawn_stream(str(d), str(calib), stride=2, skip=1)
    frames = _drain(q, proc)
    # 7 images, skip 1 -> 6, stride 2 -> 3 frames
    assert [t for t, _, _ in frames] == [0, 1, 2]
    for _, img, intr in frames:
        assert img.shape == (64, 96, 3)           # /16 crop
        np.testing.assert_allclose(intr, [90.0, 90.0, 50.0, 35.0])


def test_image_stream_undistorts_with_long_calib(tmp_path):
    from dpvo_tpu.data.stream import image_stream
    from multiprocessing import Queue

    d = tmp_path / "imgs"
    d.mkdir()
    _write_images(str(d), 1, h=64, w=96)
    plain = tmp_path / "plain.txt"
    np.savetxt(plain, np.array([[90.0, 90.0, 48.0, 32.0]]))
    dist = tmp_path / "dist.txt"
    np.savetxt(dist, np.array([[90.0, 90.0, 48.0, 32.0,
                                -0.3, 0.05, 0.0, 0.0]]))

    q1 = Queue()
    image_stream(q1, str(d), str(plain), 1, 0)
    t, img_plain, _ = q1.get(timeout=30)
    q2 = Queue()
    image_stream(q2, str(d), str(dist), 1, 0)
    t, img_dist, _ = q2.get(timeout=30)
    # distortion coefficients actually changed the pixels
    assert img_plain.shape == img_dist.shape
    assert np.abs(img_plain.astype(int) - img_dist.astype(int)).max() > 0


def test_video_stream_halves_resolution_and_intrinsics(tmp_path):
    from dpvo_tpu.data.stream import spawn_stream

    vid = str(tmp_path / "clip.avi")
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                         (128, 96))
    if not wr.isOpened():
        pytest.skip("no MJPG encoder in this OpenCV build")
    rng = np.random.default_rng(5)
    for _ in range(8):
        wr.write(rng.integers(0, 255, (96, 128, 3), np.uint8))
    wr.release()

    calib = tmp_path / "calib.txt"
    np.savetxt(calib, np.array([[100.0, 100.0, 64.0, 48.0]]))
    q, proc = spawn_stream(vid, str(calib), stride=2)
    frames = _drain(q, proc)
    assert len(frames) == 4                       # 8 frames, stride 2
    t, img, intr = frames[0]
    assert img.shape == (48, 64, 3)               # halved, /16 crop
    np.testing.assert_allclose(intr, [50.0, 50.0, 32.0, 24.0])


# ------------------------------------------------------------ image cache

def test_image_cache_remap_survives_keyframe_merges():
    from dpvo_tpu.loop_closure.retrieval.image_cache import ImageCache

    cache = ImageCache()
    try:
        imgs = []
        for n in range(6):
            img = np.full((16, 16, 3), 40 * n, np.uint8)
            imgs.append(img)
            cache(img, n)

        # engine removes keyframe 2, then keyframe 3 (post-shift ids):
        # original ids 2 and 4 drop; survivors 0 1 3 5 -> current 0 1 2 3
        cache.keyframe(2)
        cache.keyframe(3)
        want_orig = {0: 0, 1: 1, 2: 3, 3: 5}
        for cur, orig in want_orig.items():
            assert cache.original_index(cur) == orig
        frames = cache.load_frames([want_orig[c] for c in range(4)])
        for cur, f in enumerate(frames):
            assert f is not None
            # JPEG-lossy but flat images round-trip near-exactly
            assert abs(int(f[0, 0, 0]) - 40 * want_orig[cur]) <= 2
    finally:
        cache.close()
    assert not osp.isdir(cache.dir)


# --------------------------------------------------------------- html map

def test_export_html_contains_points_and_video_pane(tmp_path):
    from dpvo_tpu.viz.html_map import export_html

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    cams = rng.standard_normal((4, 3)).astype(np.float32)
    img = rng.integers(0, 255, (32, 48, 3), np.uint8)

    out = str(tmp_path / "map.html")
    export_html(out, pts, cols, cams, image=img)
    html = open(out).read()
    assert "<html" in html.lower()
    assert 'id="video"' in html                   # live-frame pane
    assert "data:image/" in html
    # point data embedded (coordinates serialized somewhere)
    assert f"{pts[0, 0]:.3f}"[:5] in html or "Float32" in html or \
        "positions" in html


# ------------------------------------------------------- eval harness IO

def test_euroc_groundtruth_parse_and_association(tmp_path):
    import evaluate_euroc as E

    seq = tmp_path / "MH_01_easy"
    gtd = seq / "mav0/state_groundtruth_estimate0"
    gtd.mkdir(parents=True)
    n = 20
    t_ns = (1.4e18 + np.arange(n) * 5e7).astype(np.int64)
    q = np.tile([1.0, 0.0, 0.0, 0.0], (n, 1))    # qw qx qy qz
    p = np.cumsum(np.full((n, 3), 0.01), axis=0)
    rows = np.concatenate([t_ns[:, None].astype(float), p, q,
                           np.zeros((n, 9))], axis=1)
    hdr = "#timestamp,px,py,pz,qw,qx,qy,qz," + ",".join(["v"] * 9)
    np.savetxt(gtd / "data.csv", rows, delimiter=",", header=hdr)

    gt_t, gt_p = E.load_groundtruth(str(seq))
    assert gt_p.shape == (n, 7)
    # csv order remaps qw qx qy qz -> xyz + (qx qy qz qw)
    np.testing.assert_allclose(gt_p[0, 3:], [0, 0, 0, 1])

    from dpvo_tpu.utils.evaluation import associate_trajectories
    est_t = gt_t[::2] + 0.001
    ii, jj = associate_trajectories(est_t, gt_t, max_diff=0.02)
    assert len(ii) == len(est_t)
    np.testing.assert_array_equal(jj, np.arange(0, n, 2))


def test_kitti_calib_and_gt_parse(tmp_path):
    import evaluate_kitti as K

    seq = tmp_path / "00"
    (seq / "image_0").mkdir(parents=True)
    with open(seq / "calib.txt", "w") as f:
        f.write("P0: 718.856 0 607.1928 0 0 718.856 185.2157 0 0 0 1 0\n")
        f.write("P1: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    intr = K.read_calib(str(seq))
    np.testing.assert_allclose(intr, [718.856, 718.856, 607.1928,
                                      185.2157])

    poses = np.tile(np.eye(3, 4).reshape(-1), (5, 1))
    poses[:, 3] = np.arange(5)                   # tx ramps
    np.savetxt(tmp_path / "00.txt", poses)
    t = K.load_kitti_gt(str(tmp_path / "00.txt"))
    np.testing.assert_allclose(t[:, 0], np.arange(5))


def test_tum_parse_list_and_association(tmp_path):
    from dpvo_tpu.data.rgbd_utils import parse_list
    from dpvo_tpu.utils.evaluation import associate_trajectories

    seq = tmp_path / "fr1"
    (seq / "rgb").mkdir(parents=True)
    with open(seq / "rgb.txt", "w") as f:
        f.write("# color images\n")
        for i in range(6):
            f.write(f"{1305031102.0 + i * 0.033:.6f} rgb/{i}.png\n")
    rl = parse_list(str(seq / "rgb.txt"), skiprows=1)
    assert rl.shape == (6, 2)
    ts = rl[:, 0].astype(np.float64)
    ii, jj = associate_trajectories(ts, ts + 0.005, max_diff=0.02)
    assert len(ii) == 6


def test_icl_scene_image_order(tmp_path):
    # ICL glob sorts numerically (0.png, 2.png, 10.png), not lexically
    seq = tmp_path / "living_room_traj0_frei_png"
    (seq / "rgb").mkdir(parents=True)
    for i in (0, 2, 10):
        cv2.imwrite(str(seq / "rgb" / f"{i}.png"),
                    np.full((16, 16, 3), i, np.uint8))
    import glob
    images = sorted(
        glob.glob(str(seq / "rgb" / "*.png")),
        key=lambda p: int(osp.splitext(osp.basename(p))[0]))
    vals = [int(cv2.imread(p)[0, 0, 0]) for p in images]
    assert vals == [0, 2, 10]
