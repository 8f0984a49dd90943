#!/usr/bin/env python
"""ICL-NUIM evaluation (ref methods/dpvo/evaluate_icl_nuim.py).

Synthetic-timestamp streaming over the scene list, Sim3 ATE against the
freiburg-format groundtruth.
"""
import argparse
import glob
import os
import os.path as osp

import numpy as np

from dpvo_tpu.config import cfg as base_cfg
from dpvo_tpu.engine import DPVO
from dpvo_tpu.utils.evaluation import ate_rmse

icl_scenes = [
    "living_room_traj0_frei_png", "living_room_traj1_frei_png",
    "living_room_traj2_frei_png", "living_room_traj3_frei_png",
    "office_room_traj0_frei_png", "office_room_traj1_frei_png",
    "office_room_traj2_frei_png", "office_room_traj3_frei_png",
]

ICL_CALIB = np.array([481.20, -480.00, 319.50, 239.50])


def run_sequence(cfg, network, seq_path, stride=1):
    import cv2

    images = sorted(glob.glob(osp.join(seq_path, "rgb/*.png")),
                    key=lambda p: int(osp.splitext(osp.basename(p))[0]))
    images = images[::stride]
    slam = None
    for t, imfile in enumerate(images):
        image = cv2.imread(imfile)
        h, w = image.shape[:2]
        image = image[:h - h % 16, :w - w % 16]
        if slam is None:
            slam = DPVO(cfg, network, ht=image.shape[0], wd=image.shape[1])
        slam(t, image, np.abs(ICL_CALIB))
    return slam.terminate()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", default=None)
    parser.add_argument("--datapath", default="datasets/ICL-NUIM")
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--config", default="configs/default.yaml")
    parser.add_argument("--opts", nargs="+", default=[])
    args = parser.parse_args()

    cfg = base_cfg
    if os.path.exists(args.config):
        cfg = cfg.merge_yaml(args.config)
    cfg = cfg.merge_opts(args.opts)

    results = {}
    for scene in icl_scenes:
        seq = osp.join(args.datapath, scene)
        gt_file = osp.join(seq, "groundtruth.txt")
        if not osp.isdir(seq) or not osp.isfile(gt_file):
            print(f"skipping missing {scene}")
            continue
        poses, _ = run_sequence(cfg, args.network, seq, args.stride)
        gt = np.loadtxt(gt_file)[::args.stride]
        n = min(len(poses), len(gt))
        results[scene] = ate_rmse(poses[:n], gt[:n, 1:4],
                                  correct_scale=True)
        print(f"{scene}: ATE {results[scene]:.4f}")

    if results:
        print("AVG:", np.mean(list(results.values())))


if __name__ == "__main__":
    main()
