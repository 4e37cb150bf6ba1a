#!/usr/bin/env python
"""Data preparation CLI (reference tools/create_data.py:245-374 equivalent).

    python tools/create_data.py a9coop_nusc --root-path RAW --out-dir DATA
    python tools/create_data.py a9_nusc     --root-path RAW --out-dir DATA
    python tools/create_data.py a9_kitti    --root-path RAW --out-dir DATA
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset",
                    choices=["a9coop_nusc", "a9_nusc", "a9_kitti",
                             "nuscenes"])
    ap.add_argument("--root-path", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--skip-gt-database", action="store_true")
    args = ap.parse_args()

    if args.dataset == "a9coop_nusc":
        from cmtcoop_tpu.data.converters import a9coop
        a9coop.convert_all(args.root_path, args.out_dir)
        if not args.skip_gt_database:
            a9coop.create_gt_database(args.out_dir)
    elif args.dataset == "a9_nusc":
        from cmtcoop_tpu.data.converters import a9_nusc
        a9_nusc.convert_all(args.root_path, args.out_dir)
    elif args.dataset == "a9_kitti":
        from cmtcoop_tpu.data.converters import a9_kitti
        a9_kitti.convert_all(args.root_path, args.out_dir)
    else:
        from cmtcoop_tpu.data.converters import nuscenes
        nuscenes.convert_all(args.root_path, args.out_dir)


if __name__ == "__main__":
    main()
