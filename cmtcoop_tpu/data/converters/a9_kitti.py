"""A9/TUMTraf OpenLabel -> KITTI-format converter (A92KITTI equivalent).

Rebuild of the reference `tools/data_converter/a9_converter.py:335-632`
(A92KITTI): infrastructure point clouds + OpenLabel cuboids -> KITTI
directory layout readable by `data.kitti_dataset.A9KittiDataset`:

    <save_dir>/<split>/velodyne/<ts>.bin    (x, y, z, intensity/256)
    <save_dir>/<split>/label_2/<ts>.txt     KITTI lines
    <save_dir>/ImageSets/<split>.txt

Label line semantics follow the reference's save_label
(a9_converter.py:527-607): truncated 0, occluded from the OpenLabel
attribute (NOT_OCCLUDED/PARTIALLY_OCCLUDED/MOSTLY_OCCLUDED -> 0/1/2),
alpha -10 (n/a without cameras), 2D bbox = BEV footprint
(x±l/2, y±w/2), dims written h w l, location = cuboid center with z
shifted to the box bottom, rotation_y = euler-z heading. We fix the
reference's bug of hard-coding occluded=0 after computing the map
(a9_converter.py:583) by actually writing the mapped value.
"""
from __future__ import annotations

import json
import os
from glob import glob
from typing import Dict, List, Sequence

import numpy as np

from cmtcoop_tpu.data.converters.pcd import pcd_to_bin
from cmtcoop_tpu.data.converters.a9coop import (
    INFRA_LIDAR_DIR, SPLIT_DIRS, quat_to_yaw)

OCCLUSION_MAP = {
    "NOT_OCCLUDED": 0, "PARTIALLY_OCCLUDED": 1, "MOSTLY_OCCLUDED": 2}


def _openlabel_to_kitti_lines(label_path: str) -> List[str]:
    with open(label_path) as f:
        anno = json.load(f)
    frame = None
    for j in anno["openlabel"]["frames"]:
        frame = anno["openlabel"]["frames"][j]
    lines = []
    for oid in frame.get("objects", {}):
        od = frame["objects"][oid]["object_data"]
        val = od["cuboid"]["val"]
        x, y, z = (float(v) for v in val[:3])
        length, width, height = (float(v) for v in val[7:10])
        heading = quat_to_yaw(val[3:7])
        occluded = 0
        for attr in od["cuboid"].get("attributes", {}).get("text", []):
            if attr["name"] == "occlusion_level":
                occluded = OCCLUSION_MAP.get(attr["val"], 0)
        bbox = (x - length / 2, y - width / 2,
                x + length / 2, y + width / 2)
        z_bottom = z - height / 2
        lines.append(
            f"{od['type']} 0 {occluded} -10 "
            f"{bbox[0]:.2f} {bbox[1]:.2f} {bbox[2]:.2f} {bbox[3]:.2f} "
            f"{height:.2f} {width:.2f} {length:.2f} "
            f"{x:.2f} {y:.2f} {z_bottom:.2f} {heading:.2f}\n")
    return lines


def convert_split(load_dir: str, save_dir: str, split: str,
                  lidar_dir: str = INFRA_LIDAR_DIR) -> List[str]:
    """One split -> KITTI layout; returns the frame ids written."""
    sdir = SPLIT_DIRS[split]
    vel_dir = os.path.join(save_dir, sdir, "velodyne")
    lab_dir = os.path.join(save_dir, sdir, "label_2")
    os.makedirs(vel_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)

    pcds = sorted(glob(os.path.join(
        load_dir, sdir, "point_clouds", lidar_dir, "*")))
    # pair labels to clouds by filename stem, not sorted index — one
    # missing/extra label file must not shift every later label onto the
    # wrong frame
    labels_by_stem = {
        os.path.splitext(os.path.basename(p))[0]: p
        for p in glob(os.path.join(
            load_dir, sdir, "labels_point_clouds", lidar_dir, "*"))}
    ids = []
    for pcd in pcds:
        stem = os.path.splitext(os.path.basename(pcd))[0]
        ids.append(stem)
        out_bin = os.path.join(vel_dir, stem + ".bin")
        if not os.path.exists(out_bin):
            pcd_to_bin(pcd, out_bin)
        if split != "testing":
            label = labels_by_stem.get(stem)
            if label is None:
                print(f"warning: no label for {sdir}/{stem}, skipping")
                continue
            with open(os.path.join(lab_dir, stem + ".txt"), "w") as f:
                f.writelines(_openlabel_to_kitti_lines(label))

    os.makedirs(os.path.join(save_dir, "ImageSets"), exist_ok=True)
    with open(os.path.join(save_dir, "ImageSets", f"{sdir}.txt"),
              "w") as f:
        f.write("\n".join(ids) + ("\n" if ids else ""))
    return ids


def convert_all(load_dir: str, save_dir: str,
                splits: Sequence[str] = ("training", "validation",
                                         "testing")) -> Dict[str, int]:
    counts = {}
    for split in splits:
        ids = convert_split(load_dir, save_dir, split)
        counts[split] = len(ids)
        print(f"{split}: {len(ids)} frames -> KITTI format")
    return counts
