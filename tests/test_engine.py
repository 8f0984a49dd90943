"""End-to-end engine smoke tests on synthetic frames (tiny config).

These run the full tracking loop — patchify, edge bookkeeping, recurrent
update, BA, keyframing, termination — with random network weights on CPU.
They check mechanics and shape discipline, not trajectory quality (that
needs trained weights; see evaluate_tartan).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dpvo_tpu.config import VOConfig
from dpvo_tpu.engine import DPVO


TINY = VOConfig(
    BUFFER_SIZE=64,
    PATCHES_PER_FRAME=8,
    REMOVAL_WINDOW=6,
    OPTIMIZATION_WINDOW=4,
    PATCH_LIFETIME=4,
    KEYFRAME_INDEX=2,
    KEYFRAME_THRESH=0.0,      # never remove keyframes unless forced
    # async decisions apply when the reader thread resolves them, which
    # under a loaded CI host can be arbitrarily late; force at lag 1 so
    # short merge-counting runs are deterministic
    ASYNC_KEYFRAME_LAG=1,
    MIXED_PRECISION=False,
    EDGE_CAPACITY=512,
    BA_WINDOW_CAP=8,
    LOOP_CLOSURE=False,
    CORR_BACKEND="xla",
)

HT, WD = 64, 96


def synthetic_stream(n, seed=0):
    """Moving random texture (rolls right) so flow is nonzero."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(HT, WD * 2, 3), dtype=np.uint8)
    for t in range(n):
        sl = np.roll(base, -3 * t, axis=1)[:, :WD]
        yield t, sl, np.array([60.0, 60.0, WD / 2, HT / 2])


@pytest.fixture(scope="module")
def tracked_slam():
    slam = DPVO(TINY, network=None, ht=HT, wd=WD)
    # random weights give arbitrary motion_probe values; force init path
    slam.motion_probe = lambda: 100.0
    for t, img, intr in synthetic_stream(12):
        slam(t, img, intr)
    return slam


def test_engine_tracks_frames(tracked_slam):
    slam = tracked_slam
    assert slam.is_initialized
    assert slam.n == 12
    assert slam.m == 12 * TINY.PATCHES_PER_FRAME
    assert slam.hs.e_num > 0
    # all edge indices within range
    e = slam.hs.e_num
    assert (slam.hs.jj[:e] < slam.n).all()
    assert (slam.hs.kk[:e] < slam.m).all()


def test_engine_state_finite(tracked_slam):
    slam = tracked_slam
    poses = np.asarray(slam.ds.poses[:slam.n])
    assert np.all(np.isfinite(poses))
    # quaternions stay normalized through BA retractions
    qn = np.linalg.norm(poses[:, 3:], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)
    patches = np.asarray(slam.ds.patches[:slam.m])
    assert np.all(np.isfinite(patches))
    assert (patches[:, 2] >= 1e-4).all()


def test_engine_terminate(tracked_slam):
    slam = tracked_slam
    poses, tstamps = slam.terminate()
    assert poses.shape == (12, 7)
    assert tstamps.shape == (12,)
    assert np.all(np.isfinite(poses))


def test_keyframe_removal_compacts_state():
    cfg = TINY.replace(KEYFRAME_THRESH=1e9)  # always remove keyframes
    slam = DPVO(cfg, network=None, ht=HT, wd=WD)
    slam.motion_probe = lambda: 100.0
    for t, img, intr in synthetic_stream(12):
        slam(t, img, intr)
    # keyframe removal fires every post-init frame: n < frames tracked
    assert slam.n < 12
    assert len(slam.hs.delta) > 0
    e = slam.hs.e_num
    assert (slam.hs.jj[:e] < slam.n).all()
    assert (slam.hs.kk[:e] // cfg.PATCHES_PER_FRAME < slam.n).all()
    # terminate interpolates removed frames through delta chains
    poses, tstamps = slam.terminate()
    assert poses.shape == (12, 7)
    assert np.all(np.isfinite(poses))


def test_non_keyframed_frames_parked():
    slam = DPVO(TINY, network=None, ht=HT, wd=WD)
    probes = iter([100.0, 1.0, 1.0, 100.0] + [100.0] * 20)
    slam.motion_probe = lambda: next(probes)
    for t, img, intr in synthetic_stream(10):
        slam(t, img, intr)
    # two frames were parked (probe < 2) -> fewer keyframes than frames
    assert slam.n == 8
    assert len(slam.hs.delta) == 2
    poses, _ = slam.terminate()
    assert poses.shape == (10, 7)


def test_loop_closure_global_ba_path():
    """LOOP_CLOSURE mode: retired edges land in the DEVICE-side inactive
    store (no per-frame fetch) and the periodic global BA replays
    inactive + active edges without corrupting state
    (ref dpvo.py:305-326)."""
    cfg = TINY.replace(LOOP_CLOSURE=True, GLOBAL_OPT_FREQ=3,
                       BACKEND_THRESH=1e9, MAX_EDGE_AGE=24)
    slam = DPVO(cfg, network=None, ht=HT, wd=WD)
    slam.motion_probe = lambda: 100.0
    for t, img, intr in synthetic_stream(16):
        slam(t, img, intr)
    # edges were retired into the inactive store...
    assert slam.hs.n_inac > 0
    assert len(slam.hs.ii_inac) == slam.hs.n_inac
    # ...their device rows are real numbers
    rows = np.asarray(slam.ds.target_inac[:slam.hs.n_inac])
    assert np.isfinite(rows).all()
    # global BA ran at least once and state stayed finite
    assert slam.ran_global_ba[:slam.n + 1].any()
    poses, _ = slam.terminate()
    assert np.isfinite(poses).all()


def test_deferred_removal_compose_across_bucket_shrink():
    """Two deferred removals whose second bucket is SMALLER than the
    first: the composed permutation must keep referencing rows from the
    first (larger) bucket, and the flushed device tables must match the
    host bookkeeping row for row (regression: the composed perm was
    truncated to the smaller bucket, clamping gathers out of range)."""
    import jax.numpy as jnp
    from dpvo_tpu.engine import kernels

    cfg = TINY.replace(EDGE_CAPACITY=4096, BUFFER_SIZE=256,
                       PATCHES_PER_FRAME=16)
    slam = DPVO(cfg, network=None, ht=HT, wd=WD)
    rng = np.random.default_rng(7)

    E1 = 1100                      # bucket 2048
    kk = rng.integers(0, 100 * 16, E1).astype(np.int32)
    jj = rng.integers(0, 100, E1).astype(np.int32)
    slam.append_factors(kk, jj)
    # tag each live edge's hidden row with its index so gathers are
    # observable
    tag = jnp.arange(cfg.EDGE_CAPACITY, dtype=jnp.float32)[:, None]
    slam.ds.net = slam.ds.net * 0 + tag
    slam.ds.target = slam.ds.target * 0 + tag

    mask1 = np.zeros(E1, bool)
    mask1[rng.choice(E1, 200, replace=False)] = True   # -> 900 live
    slam.remove_factors(mask1, store=False)
    assert slam._pending_perm is not None              # deferred
    e2 = slam.hs.e_num
    mask2 = np.zeros(e2, bool)
    mask2[rng.choice(e2, 100, replace=False)] = True   # bucket 1024
    slam.remove_factors(mask2, store=False)
    slam._flush_edge_permute()

    e = slam.hs.e_num
    assert e == E1 - 300
    np.testing.assert_array_equal(np.asarray(slam.ds.eii[:e]),
                                  slam.hs.ii[:e])
    np.testing.assert_array_equal(np.asarray(slam.ds.ejj[:e]),
                                  slam.hs.jj[:e])
    np.testing.assert_array_equal(np.asarray(slam.ds.ekk[:e]),
                                  slam.hs.kk[:e])
    # net/target rows moved with their edges: surviving edge originally
    # at row r carries tag r
    keep1 = np.nonzero(~mask1)[0]
    keep_rows = keep1[np.nonzero(~mask2)[0]]
    np.testing.assert_array_equal(
        np.asarray(slam.ds.net[:e, 0]).astype(np.int64), keep_rows)
    np.testing.assert_array_equal(
        np.asarray(slam.ds.target[:e, 0]).astype(np.int64), keep_rows)
