"""Data pipeline tests: augmentation, schedule building, synthetic
dataset round-trip, loaders."""
import os
import os.path as osp

import numpy as np
import pytest

from dpvo_tpu.data.augmentation import RGBDAugmentor
from dpvo_tpu.training import rollout as R


class TestAugmentation:
    def test_shapes_and_intrinsics(self):
        np.random.seed(0)
        aug = RGBDAugmentor(crop_size=(48, 64))
        images = np.random.rand(3, 60, 80, 3).astype(np.float32) * 255
        disps = np.random.rand(3, 60, 80).astype(np.float32)
        poses = np.zeros((3, 7), np.float32)
        poses[:, 6] = 1
        intr = np.tile(np.array([50.0, 50.0, 40.0, 30.0], np.float32),
                       (3, 1))
        im2, p2, d2, K2 = aug(images, poses, disps, intr)
        assert im2.shape == (3, 48, 64, 3)
        assert d2.shape == (3, 48, 64)
        assert K2.shape == (3, 4)
        # intrinsics scaled >= 1 then shifted by crop
        assert (K2[:, 0] >= intr[:, 0] - 1e-3).all()

    def test_color_transform_range(self):
        np.random.seed(1)
        aug = RGBDAugmentor()
        images = np.random.rand(2, 32, 32, 3).astype(np.float32) * 255
        out = aug.color_transform(images)
        assert out.shape == images.shape
        assert out.min() >= 0.0 and out.max() <= 255.0 + 1e-3


class TestSchedule:
    def test_reference_edge_counts(self):
        """Initial edges = patches(8 frames) x 8 targets (net.py:204)."""
        rng = np.random.default_rng(0)
        M = 4
        sch = R.build_schedule(n_frames=10, M=M, steps=10, rng=rng,
                               dropout_p=0.0)
        init = (sch.fresh[0]).sum()
        assert init == 8 * M * 8
        # steps 0-7: no new edges, no intro
        assert (sch.intro[:8] == -1).all()
        # step 8 introduces frame 8: kk1 = 8*M edges to frame 8,
        # kk2 = M patches x 9 targets
        assert sch.intro[8] == 8
        assert sch.fresh[8].sum() == 8 * M + M * 9

    def test_active_monotone_without_dropout(self):
        rng = np.random.default_rng(0)
        sch = R.build_schedule(12, 4, 12, rng, dropout_p=0.0)
        # once born, edges stay active
        born = np.argmax(sch.fresh, axis=0)
        for s in range(12):
            assert (sch.active[s] == (born <= s)).all() or s == 0

    def test_dropout_kills_frame_edges(self):
        # force dropout every intro
        class AlwaysDrop(np.random.Generator):
            pass
        rng = np.random.default_rng(0)
        # monkeypatch random() to always trigger
        orig = rng.random
        sch = R.build_schedule(12, 4, 12, rng, dropout_p=1.0)
        # some edges must die
        died = (sch.active[:-1] & ~sch.active[1:]).any()
        assert died

    def test_pad_schedule(self):
        rng = np.random.default_rng(0)
        sch = R.build_schedule(10, 4, 10, rng, dropout_p=0.0)
        E = len(sch.ii)
        p = R.pad_schedule(sch, E + 64)
        assert len(p.ii) == E + 64
        assert not p.active[:, E:].any()


class TestTumLoader:
    def test_loadtum_roundtrip(self, tmp_path):
        from dpvo_tpu.data.rgbd_utils import loadtum
        d = tmp_path / "seq"
        (d / "rgb").mkdir(parents=True)
        (d / "depth").mkdir()
        rgb_lines = ["# rgb"]
        depth_lines = ["# depth"]
        gt_lines = ["# gt"]
        for i in range(5):
            t = 100.0 + i * 0.1
            rgb_lines.append(f"{t:.4f} rgb/{i}.png")
            depth_lines.append(f"{t + 0.01:.4f} depth/{i}.png")
            gt_lines.append(f"{t:.4f} {i} 0 0 0 0 0 1")
        (d / "rgb.txt").write_text("\n".join(rgb_lines))
        (d / "depth.txt").write_text("\n".join(depth_lines))
        (d / "groundtruth.txt").write_text("\n".join(gt_lines))

        images, depths, poses, tstamps = loadtum(str(d))
        assert len(images) == 5
        assert len(poses) == 5
        np.testing.assert_allclose(poses[2][0], 2.0)


def test_evaluation_ate():
    from dpvo_tpu.utils.evaluation import ate_rmse
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(50, 3))
    # similarity-transformed copy must give ~0 ATE
    from scipy.spatial.transform import Rotation
    Rm = Rotation.from_euler("xyz", [0.2, 0.1, -0.4]).as_matrix()
    traj2 = 2.0 * traj @ Rm.T + np.array([1, 2, 3])
    assert ate_rmse(traj, traj2, correct_scale=True) < 1e-6
    # a noisy copy gives roughly the noise level
    traj3 = traj + rng.normal(size=traj.shape) * 0.1
    e = ate_rmse(traj3, traj, correct_scale=True)
    assert 0.05 < e < 0.2
