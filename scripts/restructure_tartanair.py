#!/usr/bin/env python
"""Restructure a TartanAir download layout into the training layout
(ref /root/reference/scripts/restructure_tartanair.py functionality).

Download layout:  root/{env}/{difficulty}/{Pxxx}.zip or extracted dirs
Training layout:  root/{env}/{env}/{difficulty}/{Pxxx}/{image_left,...}

    python scripts/restructure_tartanair.py --root datasets/TartanAir \
        [--dry-run]
"""
import argparse
import os
import os.path as osp
import shutil
import zipfile


def restructure(root, dry_run=False):
    moved = 0
    for env in sorted(os.listdir(root)):
        env_path = osp.join(root, env)
        if not osp.isdir(env_path):
            continue
        for diff in ("Easy", "Hard"):
            diff_path = osp.join(env_path, diff)
            if not osp.isdir(diff_path):
                continue
            for traj in sorted(os.listdir(diff_path)):
                src = osp.join(diff_path, traj)
                # unzip archives in place
                if traj.endswith(".zip"):
                    if dry_run:
                        print(f"would unzip {src}")
                        continue
                    with zipfile.ZipFile(src) as zf:
                        zf.extractall(diff_path)
                    os.remove(src)
                    traj = traj[:-4]
                    src = osp.join(diff_path, traj)
                if not osp.isdir(src):
                    continue
                dst = osp.join(root, env, env, diff, traj)
                if osp.isdir(dst):
                    continue
                if dry_run:
                    print(f"would move {src} -> {dst}")
                    continue
                os.makedirs(osp.dirname(dst), exist_ok=True)
                shutil.move(src, dst)
                moved += 1
    print(f"moved {moved} trajectories")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()
    restructure(args.root, args.dry_run)
