"""KITTI-style 3D detection AP (A9Dataset legacy eval path).

Self-contained numpy scorer in the spirit of mmdet3d's kitti_eval (used by
a9_kitti_dataset.py:298-364): 40-recall-point interpolated AP with greedy
max-IoU matching per image, BEV and 3D IoU variants, per-class IoU
thresholds, difficulty buckets. Covers the reference's three eval_types
(a9_kitti_dataset.py:336): metric="3d" (rotated 3D IoU), "bev" (rotated BEV
IoU) and "bbox" (image-plane axis-aligned 2D IoU on per-frame `boxes2d`).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from cmtcoop_tpu.data.eval.rotated_iou import bev_iou, iou_3d

DEFAULT_IOU_THRESHOLDS = {
    "CAR": 0.7, "VAN": 0.7, "TRUCK": 0.7, "BUS": 0.7, "TRAILER": 0.7,
    "PEDESTRIAN": 0.5, "BICYCLE": 0.5, "MOTORCYCLE": 0.5,
}


def _ap40(tp_flags: np.ndarray, scores: np.ndarray, n_gt: int) -> float:
    """40-point interpolated AP (KITTI 2017 protocol)."""
    if n_gt == 0:
        return 0.0
    order = np.argsort(-scores)
    tp = np.cumsum(tp_flags[order])
    fp = np.cumsum(~tp_flags[order])
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1)
    ap = 0.0
    for t in np.linspace(1.0 / 40, 1.0, 40):
        mask = recall >= t
        ap += (np.max(precision[mask]) if mask.any() else 0.0) / 40
    return float(ap)


def kitti_eval(
    gt_by_frame: Dict, pred_by_frame: Dict, class_names: Sequence[str],
    iou_thresholds: Dict[str, float] = None, metric: str = "3d",
) -> Dict[str, float]:
    """gt/pred_by_frame: {frame: dict(boxes (N, 7+) bottom-centered, labels,
    scores (pred only), difficulty (gt, optional int 0/1/2), boxes2d
    (N, 4) [x1, y1, x2, y2] for metric="bbox")}."""
    iou_thresholds = dict(DEFAULT_IOU_THRESHOLDS if iou_thresholds is None
                          else iou_thresholds)
    if metric == "bbox":
        from cmtcoop_tpu.data.eval.kitti_format import iou_2d
        iou_fn = iou_2d
        box_key = "boxes2d"
        empty = np.zeros((0, 4))
    else:
        iou_fn = iou_3d if metric == "3d" else bev_iou
        box_key = "boxes"
        empty = np.zeros((0, 7))
    results = {}
    difficulties = [0, 1, 2, None]  # easy / moderate / hard / overall
    for ci, cls in enumerate(class_names):
        thr = iou_thresholds.get(cls, 0.5)
        for diff in difficulties:
            flags_all: List[np.ndarray] = []
            scores_all: List[np.ndarray] = []
            n_gt = 0
            for frame in gt_by_frame:
                gt = gt_by_frame[frame]
                pd = pred_by_frame.get(frame, {
                    box_key: empty, "labels": np.zeros(0, int),
                    "scores": np.zeros(0)})
                gmask = np.asarray(gt["labels"]) == ci
                if diff is not None and "difficulty" in gt:
                    gmask &= np.asarray(gt["difficulty"]) == diff
                gboxes = np.asarray(gt[box_key])[gmask]
                pmask = np.asarray(pd["labels"]) == ci
                pboxes = np.asarray(pd[box_key])[pmask]
                pscores = np.asarray(pd["scores"])[pmask]
                n_gt += len(gboxes)
                if len(pboxes) == 0:
                    continue
                matched = np.zeros(len(gboxes), bool)
                flags = np.zeros(len(pboxes), bool)
                order = np.argsort(-pscores)
                if len(gboxes):
                    ious = iou_fn(pboxes, gboxes)
                    for pi in order:
                        gi = int(np.argmax(
                            np.where(matched, -1.0, ious[pi])))
                        if ious[pi, gi] >= thr and not matched[gi]:
                            matched[gi] = True
                            flags[pi] = True
                flags_all.append(flags)
                scores_all.append(pscores)
            if flags_all:
                ap = _ap40(np.concatenate(flags_all),
                           np.concatenate(scores_all), n_gt)
            else:
                ap = 0.0
            tag = {0: "easy", 1: "moderate", 2: "hard",
                   None: "overall"}[diff]
            results[f"{cls}_{metric}_{tag}"] = round(ap * 100, 2)
    for tag in ("easy", "moderate", "hard", "overall"):
        vals = [results[f"{c}_{metric}_{tag}"] for c in class_names]
        results[f"mAP_{metric}_{tag}"] = round(float(np.mean(vals)), 2)
    return results
