#!/usr/bin/env python
"""KITTI odometry evaluation (ref methods/dpvo/evaluate_kitti.py).

Reads sequence images + P0 calibration, crops to a /4 multiple, runs
DPVO-TPU, and scores ATE against the groundtruth pose files.
"""
import argparse
import glob
import os
import os.path as osp

import numpy as np

from dpvo_tpu.config import cfg as base_cfg
from dpvo_tpu.engine import DPVO
from dpvo_tpu.utils.evaluation import ate_rmse


def read_calib(seq_path):
    """P0 projection matrix -> [fx fy cx cy] (ref evaluate_kitti.py:43)."""
    calib_file = osp.join(seq_path, "calib.txt")
    with open(calib_file) as f:
        for line in f:
            if line.startswith("P0:"):
                P0 = np.array([float(x) for x in line.split()[1:]])
                P0 = P0.reshape(3, 4)
                return np.array([P0[0, 0], P0[1, 1], P0[0, 2], P0[1, 2]])
    raise ValueError(f"P0 not found in {calib_file}")


def load_kitti_gt(gt_file):
    """KITTI pose file: 3x4 row-major world-from-camera matrices."""
    data = np.loadtxt(gt_file).reshape(-1, 3, 4)
    return data[:, :, 3]  # translations suffice for ATE


def run_sequence(cfg, network, seq_path, stride=1):
    import cv2

    intrinsics = read_calib(seq_path)
    images = sorted(glob.glob(osp.join(seq_path, "image_0/*.png")))[::stride]
    slam = None
    for t, imfile in enumerate(images):
        image = cv2.imread(imfile)
        if image.ndim == 2 or image.shape[2] == 1:
            image = cv2.cvtColor(image, cv2.COLOR_GRAY2BGR)
        h, w = image.shape[:2]
        image = image[:h - h % 4, :w - w % 4]
        if slam is None:
            slam = DPVO(cfg, network, ht=image.shape[0], wd=image.shape[1])
        slam(t, image, intrinsics)
    return slam.terminate()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", default=None)
    parser.add_argument("--datapath", default="datasets/KITTI/odometry")
    parser.add_argument("--sequences", nargs="+",
                        default=[f"{i:02d}" for i in range(11)])
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--config", default="configs/default.yaml")
    parser.add_argument("--opts", nargs="+", default=[])
    args = parser.parse_args()

    cfg = base_cfg
    if os.path.exists(args.config):
        cfg = cfg.merge_yaml(args.config)
    cfg = cfg.merge_opts(args.opts)

    results = {}
    for seq in args.sequences:
        seq_path = osp.join(args.datapath, "sequences", seq)
        gt_file = osp.join(args.datapath, "poses", f"{seq}.txt")
        if not osp.isdir(seq_path) or not osp.isfile(gt_file):
            print(f"skipping missing {seq}")
            continue
        poses, _ = run_sequence(cfg, args.network, seq_path, args.stride)
        gt_t = load_kitti_gt(gt_file)[::args.stride]
        n = min(len(poses), len(gt_t))
        results[seq] = ate_rmse(poses[:n], gt_t[:n], correct_scale=True)
        print(f"{seq}: ATE {results[seq]:.4f}")

    if results:
        print("AVG:", np.mean(list(results.values())))


if __name__ == "__main__":
    main()
