"""A9 KITTI-format dataset (A9Dataset rebuild, legacy path).

The reference keeps a KITTI-style loader + mmdet3d kitti_eval for the A9
intersection release (datasets/a9_kitti_dataset.py:24-648); unused by the
CMTCoop configs but part of the capability surface. Reads KITTI-layout
directories (velodyne/*.bin, label_2/*.txt, calib/*.txt) and evaluates with
the in-repo KITTI-style AP40 scorer (data/eval/kitti.py).
"""
from __future__ import annotations

import os
from glob import glob
from typing import Dict, List, Optional, Sequence

import numpy as np

from cmtcoop_tpu.data.eval.kitti import kitti_eval


def parse_kitti_label(path: str, class_names: Sequence[str]):
    """KITTI label_2 txt -> (boxes9 bottom-centered lidar-frame-ish, labels,
    difficulty). Assumes labels already in lidar coords (the A9 KITTI export
    writes lidar-frame cuboids)."""
    boxes, labels, diffs = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            name = parts[0]
            if name not in class_names:
                continue
            trunc, occ = float(parts[1]), int(float(parts[2]))
            h, w, l = (float(parts[8]), float(parts[9]), float(parts[10]))
            x, y, z = (float(parts[11]), float(parts[12]),
                       float(parts[13]))
            ry = float(parts[14])
            # box convention: col 3 = size along heading (KITTI l), col 4 =
            # lateral size (KITTI w) — matches corners_bev / the writers
            boxes.append([x, y, z, l, w, h, ry, 0.0, 0.0])
            labels.append(class_names.index(name))
            diffs.append(min(occ, 2))
    boxes = (np.asarray(boxes, np.float32) if boxes
             else np.zeros((0, 9), np.float32))
    return boxes, np.asarray(labels, np.int64), np.asarray(diffs, np.int64)


class A9KittiDataset:
    def __init__(self, root: str, split: str, class_names: Sequence[str],
                 pipeline=None, point_dims: Optional[int] = 5):
        """point_dims: floats per point in the velodyne .bin files.
        Defaults to 5, the layout our converter writes
        (converters/pcd.py::pcd_to_bin: x, y, z, i/256, 0). Pass 4 for
        legacy KITTI bins, or None to infer from file size — inference
        raises on ambiguous sizes (divisible by both 4 and 5) rather
        than silently corrupting every point."""
        self.root = root
        self.class_names = list(class_names)
        self.pipeline = pipeline
        self.point_dims = point_dims
        split_file = os.path.join(root, "ImageSets", f"{split}.txt")
        if os.path.exists(split_file):
            with open(split_file) as f:
                self.ids = [x.strip() for x in f if x.strip()]
        else:
            self.ids = sorted(
                os.path.splitext(os.path.basename(p))[0]
                for p in glob(os.path.join(root, split, "velodyne", "*")))
        self.split = split

    def __len__(self):
        return len(self.ids)

    def get_raw_sample(self, index: int, rng: np.random.Generator) -> Dict:
        fid = self.ids[index]
        # bins written by converters.pcd.pcd_to_bin are (x, y, z, i/256, 0)
        path = os.path.join(self.root, self.split, "velodyne", fid + ".bin")
        raw = np.fromfile(path, np.float32)
        dims = self.point_dims
        if dims is None:  # infer, but only when unambiguous
            by5, by4 = raw.size % 5 == 0, raw.size % 4 == 0
            if by5 and by4:
                raise ValueError(
                    f"{path}: size {raw.size} divisible by both 4 and 5; "
                    "pass point_dims explicitly")
            dims = 5 if by5 else 4
        pts = raw.reshape(-1, dims)
        if dims == 4:  # pad legacy bins to the 5-dim layout
            pts = np.pad(pts, ((0, 0), (0, 1)))
        sample: Dict = dict(points=pts, frame_id=fid)
        label_path = os.path.join(
            self.root, self.split, "label_2", fid + ".txt")
        if os.path.exists(label_path):
            boxes, labels, diffs = parse_kitti_label(
                label_path, self.class_names)
            sample["gt_boxes_3d"] = boxes
            sample["gt_labels_3d"] = labels
            sample["gt_difficulty"] = diffs
        return sample

    def __getitem__(self, index):
        rng = np.random.default_rng(index)
        s = self.get_raw_sample(index, rng)
        return self.pipeline(s, rng) if self.pipeline else s

    def evaluate(self, pred_by_frame: Dict, metric: str = "3d") -> Dict:
        gt = {}
        for i, fid in enumerate(self.ids):
            s = self.get_raw_sample(i, np.random.default_rng(0))
            boxes = s.get("gt_boxes_3d", np.zeros((0, 9), np.float32))
            # axis-aligned BEV footprint, the same 2D-bbox convention the
            # A92KITTI writer uses (converters/a9_kitti.py bbox columns) —
            # makes metric="bbox" reachable through the dataset
            boxes2d = np.stack([
                boxes[:, 0] - boxes[:, 3] / 2,
                boxes[:, 1] - boxes[:, 4] / 2,
                boxes[:, 0] + boxes[:, 3] / 2,
                boxes[:, 1] + boxes[:, 4] / 2,
            ], axis=-1) if len(boxes) else np.zeros((0, 4), np.float32)
            gt[fid] = dict(
                boxes=boxes,
                boxes2d=boxes2d,
                labels=s.get("gt_labels_3d", np.zeros(0, np.int64)),
                difficulty=s.get("gt_difficulty",
                                 np.zeros(0, np.int64)))
        return kitti_eval(gt, pred_by_frame, self.class_names,
                          metric=metric)
