#!/usr/bin/env python
"""Run DPVO-TPU on an image directory or video (ref methods/dpvo/demo.py).

    python demo.py --imagedir <dir-or-video> --calib calib/tartan.txt \
        --network weights.npz --plot --save_ply --save_trajectory
"""
import argparse
import os
from multiprocessing import Process, Queue
from pathlib import Path

import numpy as np

from dpvo_tpu.config import cfg as base_cfg
from dpvo_tpu.engine import DPVO
from dpvo_tpu.data.stream import spawn_stream
from dpvo_tpu.utils.plot_utils import (plot_trajectory, save_ply,
                                       save_output_for_COLMAP,
                                       save_trajectory_tum_format)
from dpvo_tpu.utils.timing import Timer


def run(cfg, network, imagedir, calib, stride=1, skip=0, viz=False,
        timeit=False):
    slam = None
    intrinsics = None
    queue, reader = spawn_stream(imagedir, calib, stride, skip)

    while True:
        # the sentinel item is (-1, None, None) — keep the last real
        # intrinsics for the COLMAP export below
        t, image, intr = queue.get()
        if t < 0:
            break
        intrinsics = intr

        if slam is None:
            H, W = image.shape[:2]
            slam = DPVO(cfg, network, ht=H, wd=W, viz=viz)

        with Timer("SLAM", enabled=timeit):
            slam(t, image, intrinsics)

    reader.join()

    points = np.asarray(slam.points[:slam.m])
    colors = np.asarray(slam.ds.colors[:slam.n]).reshape(-1, 3)

    return slam.terminate(), (points, colors, (*intrinsics, H, W))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", type=str, default=None)
    parser.add_argument("--imagedir", type=str, required=True)
    parser.add_argument("--calib", type=str, required=True)
    parser.add_argument("--name", type=str, default="result",
                        help="name your run")
    parser.add_argument("--stride", type=int, default=2)
    parser.add_argument("--skip", type=int, default=0)
    parser.add_argument("--config", default="configs/default.yaml")
    parser.add_argument("--timeit", action="store_true")
    parser.add_argument("--viz", action="store_true")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--opts", nargs="+", default=[])
    parser.add_argument("--save_ply", action="store_true")
    parser.add_argument("--save_colmap", action="store_true")
    parser.add_argument("--save_trajectory", action="store_true")
    args = parser.parse_args()

    cfg = base_cfg
    if os.path.exists(args.config):
        cfg = cfg.merge_yaml(args.config)
    cfg = cfg.merge_opts(args.opts)
    print("Running with config...")
    print(cfg)

    (poses, tstamps), (points, colors, calib_out) = run(
        cfg, args.network, args.imagedir, args.calib, args.stride,
        args.skip, args.viz, args.timeit)

    if args.save_ply:
        save_ply(f"{args.name}.ply", points,
                 np.tile(colors, (len(points) // max(len(colors), 1) + 1,
                                  1))[:len(points)])

    if args.save_trajectory:
        save_trajectory_tum_format(poses, tstamps,
                                   f"saved_trajectories/{args.name}.txt")

    if args.save_colmap:
        save_output_for_COLMAP(f"colmap_saves/{args.name}", poses, tstamps,
                               points, colors, *calib_out)

    if args.plot:
        plot_trajectory(poses, tstamps, title=f"DPVO-TPU: {args.name}",
                        filename=f"trajectory_plots/{args.name}.pdf")
