#!/usr/bin/env python
"""Data-pipeline benchmark (ref methods/dpvo/benchmark_dataloader.py):
times augmentation + batch-prep throughput on synthetic frames."""
import sys
import os.path as osp
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def bench_augmentation(n_iters=20, n_frames=15, hw=(480, 640)):
    from dpvo_tpu.data.augmentation import RGBDAugmentor
    aug = RGBDAugmentor(crop_size=hw)
    H, W = 520, 696
    images = (np.random.rand(n_frames, H, W, 3) * 255).astype(np.float32)
    disps = np.random.rand(n_frames, H, W).astype(np.float32)
    poses = np.zeros((n_frames, 7), np.float32)
    poses[:, 6] = 1
    intr = np.tile(np.array([320.0, 320, 320, 240], np.float32),
                   (n_frames, 1))

    aug(images, poses, disps, intr)  # warmup
    t0 = time.perf_counter()
    for _ in range(n_iters):
        aug(images, poses, disps, intr)
    dt = (time.perf_counter() - t0) / n_iters
    print(f"augmentation: {dt*1000:.1f} ms/sample "
          f"({n_frames} frames @ {hw})")


def bench_batch_prep(n_iters=10):
    import train as train_cli
    rng = np.random.default_rng(0)
    B, N, H, W, M, S = 1, 15, 480, 640, 80, 18
    images = rng.random((B, N, H, W, 3), np.float32) * 255
    poses = np.zeros((B, N, 7), np.float32)
    poses[..., 6] = 1
    disps = rng.random((B, N, H, W)).astype(np.float32)
    intr = np.tile(np.array([320.0, 320, 320, 240], np.float32),
                   (B, N, 1))
    train_cli.prepare_batch(rng, images, poses, disps, intr, M, S)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        train_cli.prepare_batch(rng, images, poses, disps, intr, M, S)
    dt = (time.perf_counter() - t0) / n_iters
    print(f"batch prep (incl. schedule build): {dt*1000:.1f} ms/sample")


if __name__ == "__main__":
    bench_augmentation()
    bench_batch_prep()
