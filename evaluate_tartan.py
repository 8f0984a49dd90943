#!/usr/bin/env python
"""TartanAir evaluation (ref methods/dpvo/evaluate_tartan.py).

Runs DPVO-TPU on the validation (or test) split, scores Sim3-aligned ATE
RMSE per scene (median over trials), and reports AUC = mean(max(1-ATE, 0))
and the average of scene medians — the reference's protocol
(evaluate_tartan.py:60-67, :131-144).
"""
import argparse
import glob
import os
import os.path as osp
from datetime import datetime

import numpy as np

from dpvo_tpu.config import cfg as base_cfg
from dpvo_tpu.data.tartan import test_split
from dpvo_tpu.engine import DPVO
from dpvo_tpu.utils.evaluation import ate_rmse, load_tartan_pose_file

test_sequences = [f"MH{i:03d}" for i in range(8)]  # mono test split


def run_sequence(cfg, network, scene_path, stride=1):
    import cv2

    images = sorted(glob.glob(osp.join(scene_path, "image_left/*.png")))
    if len(images) == 0:
        raise FileNotFoundError(f"no images in {scene_path}")

    intrinsics = np.array([320.0, 320.0, 320.0, 240.0])
    slam = None
    for t, imfile in enumerate(images[::stride]):
        image = cv2.imread(imfile)
        if slam is None:
            slam = DPVO(cfg, network, ht=image.shape[0], wd=image.shape[1])
        slam(t, image, intrinsics)

    return slam.terminate()


def evaluate_scene(cfg, network, scene_path, trials=1, stride=1):
    pose_file = osp.join(scene_path, "pose_left.txt")
    traj_ref = load_tartan_pose_file(pose_file)[::stride]

    results = []
    for _ in range(trials):
        poses, tstamps = run_sequence(cfg, network, scene_path, stride)
        n = min(len(poses), len(traj_ref))
        results.append(ate_rmse(poses[:n], traj_ref[:n],
                                correct_scale=True))
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", default=None)
    parser.add_argument("--datapath", default="datasets/TartanAir")
    parser.add_argument("--split", choices=["validation", "test"],
                        default="validation")
    parser.add_argument("--trials", type=int, default=1)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--config", default="configs/default.yaml")
    parser.add_argument("--opts", nargs="+", default=[])
    args = parser.parse_args()

    cfg = base_cfg
    if os.path.exists(args.config):
        cfg = cfg.merge_yaml(args.config)
    cfg = cfg.merge_opts(args.opts)

    if args.split == "validation":
        scenes = [osp.join(args.datapath, s) for s in test_split]
    else:
        scenes = [osp.join(args.datapath, "mono", s)
                  for s in test_sequences]

    results = {}
    for scene in scenes:
        if not osp.isdir(scene):
            print(f"skipping missing scene {scene}")
            continue
        errs = evaluate_scene(cfg, args.network, scene, args.trials,
                              args.stride)
        results[scene] = float(np.median(errs))
        print(f"{scene}: ATE median {results[scene]:.4f} "
              f"(trials: {['%.4f' % e for e in errs]})")

    if results:
        ates = np.array(list(results.values()))
        auc = float(np.mean(np.maximum(1.0 - ates, 0.0)))
        avg = float(ates.mean())
        print(f"AUC: {auc:.4f}  AVG: {avg:.4f}")

        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        os.makedirs("results", exist_ok=True)
        with open(f"results/tartan_{stamp}.txt", "w") as f:
            for k, v in results.items():
                f.write(f"{k} {v:.6f}\n")
            f.write(f"AUC {auc:.6f}\nAVG {avg:.6f}\n")


if __name__ == "__main__":
    main()
