#!/usr/bin/env python
"""TUM-RGBD (freiburg1) evaluation (ref methods/dpvo/evaluate_tum.py).

fr1 intrinsics + radtan undistortion + boundary crop, timestamp-associated
Sim3 ATE against groundtruth.txt.
"""
import argparse
import os
import os.path as osp

import numpy as np

from dpvo_tpu.config import cfg as base_cfg
from dpvo_tpu.data.rgbd_utils import parse_list
from dpvo_tpu.engine import DPVO
from dpvo_tpu.utils.evaluation import associate_trajectories, ate_rmse

fr1_scenes = [
    "rgbd_dataset_freiburg1_360", "rgbd_dataset_freiburg1_desk",
    "rgbd_dataset_freiburg1_desk2", "rgbd_dataset_freiburg1_floor",
    "rgbd_dataset_freiburg1_plant", "rgbd_dataset_freiburg1_room",
    "rgbd_dataset_freiburg1_rpy", "rgbd_dataset_freiburg1_teddy",
    "rgbd_dataset_freiburg1_xyz",
]

# hard-coded fr1 intrinsics + distortion (ref evaluate_tum.py:26-41)
FR1_CALIB = np.array([517.3, 516.5, 318.6, 255.3,
                      0.2624, -0.9531, -0.0054, 0.0026, 1.1633])


def run_sequence(cfg, network, seq_path, stride=1):
    import cv2

    K = np.eye(3)
    K[0, 0], K[0, 2] = FR1_CALIB[0], FR1_CALIB[2]
    K[1, 1], K[1, 2] = FR1_CALIB[1], FR1_CALIB[3]

    rgb_list = parse_list(osp.join(seq_path, "rgb.txt"), skiprows=1)
    tstamps_all = rgb_list[:, 0].astype(np.float64)[::stride]
    files = rgb_list[:, 1][::stride]

    slam = None
    tstamps = []
    for t, (ts, imfile) in enumerate(zip(tstamps_all, files)):
        image = cv2.imread(osp.join(seq_path, imfile))
        image = cv2.undistort(image, K, FR1_CALIB[4:])
        # boundary crop (ref evaluate_tum.py crop)
        image = image[16:-16, 16:-16]
        h, w = image.shape[:2]
        image = image[:h - h % 16, :w - w % 16]
        intr = FR1_CALIB[:4] - np.array([0, 0, 16, 16])
        if slam is None:
            slam = DPVO(cfg, network, ht=image.shape[0], wd=image.shape[1])
        slam(t, image, intr)
        tstamps.append(ts)

    poses, _ = slam.terminate()
    return poses, np.array(tstamps)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", default=None)
    parser.add_argument("--datapath", default="datasets/TUM-RGBD")
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--config", default="configs/default.yaml")
    parser.add_argument("--opts", nargs="+", default=[])
    args = parser.parse_args()

    cfg = base_cfg
    if os.path.exists(args.config):
        cfg = cfg.merge_yaml(args.config)
    cfg = cfg.merge_opts(args.opts)

    results = {}
    for scene in fr1_scenes:
        seq = osp.join(args.datapath, scene)
        if not osp.isdir(seq):
            print(f"skipping missing {scene}")
            continue
        poses, tstamps = run_sequence(cfg, args.network, seq, args.stride)
        gt = np.loadtxt(osp.join(seq, "groundtruth.txt"))
        ii, jj = associate_trajectories(tstamps, gt[:, 0], max_diff=0.02)
        results[scene] = ate_rmse(poses[ii], gt[jj, 1:4],
                                  correct_scale=True)
        print(f"{scene}: ATE {results[scene]:.4f}")

    if results:
        print("AVG:", np.mean(list(results.values())))


if __name__ == "__main__":
    main()
