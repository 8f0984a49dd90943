#!/usr/bin/env python
"""Offline Redwood scene_info pickle build with frame stride
(ref methods/dpvo/scripts/build_redwood_pickle.py).

    python scripts/build_redwood_pickle.py --root datasets/redwood \
        --mode train --stride 2
"""
import argparse
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--mode", default="train",
                        choices=["train", "validation", "test"])
    parser.add_argument("--stride", type=int, default=1,
                        help="keep every Nth frame")
    args = parser.parse_args()

    from dpvo_tpu.data.redwood import Redwood

    # build without the automatic cache, apply stride, save manually
    class _NoCache(Redwood):
        def _load_or_build_scene_info(self, _):
            return self._build_dataset()

        def _build_dataset_index(self):
            self.dataset_index = []

    ds = _NoCache(mode=args.mode, datapath=args.root, aug=False)
    info = ds.scene_info

    if args.stride > 1:
        for scene, d in info.items():
            d["images"] = d["images"][::args.stride]
            d["depths"] = d["depths"][::args.stride]
            d["poses"] = d["poses"][::args.stride]
            d["intrinsics"] = d["intrinsics"][::args.stride]
            # rebuild the graph on the strided sequence
            d["graph"] = ds.build_frame_graph(d["poses"], d["depths"],
                                              d["intrinsics"])

    cache_dir = osp.join(args.root, "cache")
    import os
    os.makedirs(cache_dir, exist_ok=True)
    path = osp.join(cache_dir, f"Redwood_{args.mode}.pickle")
    pickle.dump(info, open(path, "wb"))
    print(f"saved {path} ({len(info)} scenes)")


if __name__ == "__main__":
    main()
