#!/usr/bin/env python
"""EuRoC-MAV evaluation (ref methods/dpvo/evaluate_euroc.py).

Streams cam0 images with the EuRoC calibration (radtan distortion),
runs DPVO-TPU, aligns against the state-estimate groundtruth with
timestamp association, and reports Sim3-aligned ATE RMSE per sequence.
"""
import argparse
import glob
import os
import os.path as osp

import numpy as np

from dpvo_tpu.config import cfg as base_cfg
from dpvo_tpu.engine import DPVO
from dpvo_tpu.utils.evaluation import (associate_trajectories, ate_rmse)

euroc_scenes = [
    "MH_01_easy", "MH_02_easy", "MH_03_medium", "MH_04_difficult",
    "MH_05_difficult", "V1_01_easy", "V1_02_medium", "V1_03_difficult",
    "V2_01_easy", "V2_02_medium", "V2_03_difficult",
]

# cam0 calibration (fx fy cx cy k1 k2 p1 p2), ref calib/euroc.txt
EUROC_CALIB = np.array([458.654, 457.296, 367.215, 248.375,
                        -0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])


def run_sequence(cfg, network, imagedir, stride=2, skip=0):
    import cv2

    K = np.eye(3)
    K[0, 0], K[0, 2] = EUROC_CALIB[0], EUROC_CALIB[2]
    K[1, 1], K[1, 2] = EUROC_CALIB[1], EUROC_CALIB[3]

    images = sorted(glob.glob(osp.join(imagedir, "*.png")))[skip::stride]
    slam = None
    tstamps = []
    for t, imfile in enumerate(images):
        image = cv2.imread(imfile)
        image = cv2.undistort(image, K, EUROC_CALIB[4:])
        h, w = image.shape[:2]
        image = image[:h - h % 16, :w - w % 16]
        if slam is None:
            slam = DPVO(cfg, network, ht=image.shape[0], wd=image.shape[1])
        slam(t, image, EUROC_CALIB[:4])
        tstamps.append(float(osp.basename(imfile)[:-4]) / 1e9)

    poses, _ = slam.terminate()
    return poses, np.array(tstamps)


def load_groundtruth(seq_path):
    gt_file = osp.join(seq_path, "mav0/state_groundtruth_estimate0/data.csv")
    data = np.loadtxt(gt_file, delimiter=",", skiprows=1)
    tstamps = data[:, 0] / 1e9
    # csv is [t, px py pz, qw qx qy qz, ...] -> xyz + qxyzw
    poses = np.concatenate([data[:, 1:4], data[:, 5:8], data[:, 4:5]],
                           axis=1)
    return tstamps, poses


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", default=None)
    parser.add_argument("--datapath", default="datasets/EuRoC")
    parser.add_argument("--stride", type=int, default=2)
    parser.add_argument("--config", default="configs/default.yaml")
    parser.add_argument("--opts", nargs="+", default=[])
    args = parser.parse_args()

    cfg = base_cfg
    if os.path.exists(args.config):
        cfg = cfg.merge_yaml(args.config)
    cfg = cfg.merge_opts(args.opts)

    results = {}
    for scene in euroc_scenes:
        seq = osp.join(args.datapath, scene)
        imagedir = osp.join(seq, "mav0/cam0/data")
        if not osp.isdir(imagedir):
            print(f"skipping missing {scene}")
            continue
        poses, tstamps = run_sequence(cfg, args.network, imagedir,
                                      args.stride)
        gt_t, gt_p = load_groundtruth(seq)
        ii, jj = associate_trajectories(tstamps, gt_t, max_diff=0.02)
        ate = ate_rmse(poses[ii], gt_p[jj], correct_scale=True)
        results[scene] = ate
        print(f"{scene}: ATE {ate:.4f}")

    if results:
        print("AVG:", np.mean(list(results.values())))


if __name__ == "__main__":
    main()
