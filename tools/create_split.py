#!/usr/bin/env python
"""Train/val/test split generation (reference tools/create_a9_split.py
equivalent): deterministic stratified split of a raw TUMTraf-layout dataset
into train/val/test directories or file lists."""
import argparse
import json
import os
import sys
from glob import glob

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root-path", required=True,
                    help="dir with point_clouds/<sensor>/*.pcd")
    ap.add_argument("--sensor", default="s110_lidar_ouster_south")
    ap.add_argument("--out", default="splits.json")
    ap.add_argument("--ratios", default="0.8,0.1,0.1")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    files = sorted(glob(os.path.join(
        args.root_path, "point_clouds", args.sensor, "*")))
    stems = [os.path.splitext(os.path.basename(f))[0] for f in files]
    if not stems:
        raise SystemExit("no point clouds found")
    r = [float(x) for x in args.ratios.split(",")]
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(stems))
    n_train = int(len(stems) * r[0])
    n_val = int(len(stems) * r[1])
    split = {
        "train": sorted(stems[i] for i in order[:n_train]),
        "val": sorted(stems[i] for i in order[n_train:n_train + n_val]),
        "test": sorted(stems[i] for i in order[n_train + n_val:]),
    }
    with open(args.out, "w") as f:
        json.dump(split, f, indent=1)
    print({k: len(v) for k, v in split.items()}, "->", args.out)


if __name__ == "__main__":
    main()
