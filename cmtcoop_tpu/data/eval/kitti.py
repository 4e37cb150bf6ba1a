"""KITTI-style 3D detection AP (A9Dataset legacy eval path).

Self-contained numpy scorer replicating mmdet3d's kitti_eval semantics
(used by the reference's a9_kitti_dataset.py:298-364): 40-recall-point
interpolated AP with greedy max-IoU matching per frame, BEV and 3D IoU
variants, per-class IoU thresholds, difficulty buckets, and the KITTI
ignored-box protocol:

- **difficulty is cumulative**: at level d, GT with difficulty <= d is
  valid; GT of the same class with difficulty > d (or -1 = unknown) is
  IGNORED — a detection matching it is neither TP nor FP, and it is not
  counted in the recall denominator (kitti clean_data: occ/trunc/height
  thresholds per level).
- **neighbor-class ignores**: GT of a configured similar class (KITTI:
  Van for Car, Person_sitting for Pedestrian) is ignored the same way.
- **DontCare regions**: GT rows with label -1; an otherwise-FP detection
  whose overlap-over-own-area with a DontCare box exceeds the class
  threshold is dropped (kitti compute_fp dc filtering, criterion=0).
- **min-height filtering** (metric="bbox" only): detections shorter than
  MIN_HEIGHT[difficulty] pixels are ignored — not FP, and a valid GT they
  match leaves the recall denominator (kitti ignored-det assignment).

A9 adaptations (documented deviations): A9 lidar labels carry a single
difficulty int (derived from OpenLabel occlusion) instead of
occ/trunc/2D-height triples, so the cumulative-difficulty rule uses that
int directly; DontCare filtering for metric="3d"/"bev" uses the BEV
footprint (the official protocol only defines DontCare in the image
plane, which A9 lidar-only frames do not have).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from cmtcoop_tpu.data.eval.rotated_iou import bev_iou, iou_3d

DEFAULT_IOU_THRESHOLDS = {
    "CAR": 0.7, "VAN": 0.7, "TRUCK": 0.7, "BUS": 0.7, "TRAILER": 0.7,
    "PEDESTRIAN": 0.5, "BICYCLE": 0.5, "MOTORCYCLE": 0.5,
}

# kitti eval.py clean_data: classes whose GT is ignored (not FP-matched)
# when evaluating the key class
DEFAULT_NEIGHBOR_IGNORES = {
    "CAR": ("VAN",),
    "PEDESTRIAN": ("PERSON_SITTING",),
}

MIN_HEIGHT = (40.0, 25.0, 25.0)  # px, per difficulty (kitti eval.py)

DONTCARE = -1  # gt label value marking a DontCare region


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


def _overlap_over_area(pboxes: np.ndarray, dc: np.ndarray) -> np.ndarray:
    """2D intersection / det-own-area (kitti image_box_overlap
    criterion=0) for [x1, y1, x2, y2] boxes -> (P, D)."""
    ix = (np.minimum(pboxes[:, None, 2], dc[None, :, 2])
          - np.maximum(pboxes[:, None, 0], dc[None, :, 0])).clip(min=0)
    iy = (np.minimum(pboxes[:, None, 3], dc[None, :, 3])
          - np.maximum(pboxes[:, None, 1], dc[None, :, 1])).clip(min=0)
    area = ((pboxes[:, 2] - pboxes[:, 0])
            * (pboxes[:, 3] - pboxes[:, 1])).clip(min=1e-9)
    return ix * iy / area[:, None]


def _frame_stats(gboxes, g_ignored, pboxes, pscores, p_ignored, dc_boxes,
                 iou_fn, dc_overlap_fn, thr):
    """Greedy matching with KITTI ignore tiers for one frame + class.

    Returns (flags, scores, n_gt_removed): flags/scores enter the PR
    curve; n_gt_removed counts valid GT absorbed by ignored detections
    (they leave the recall denominator, kitti ignored-det assignment).
    """
    n_p = len(pboxes)
    keep = np.ones(n_p, bool)       # survives into the PR lists
    flags = np.zeros(n_p, bool)     # TP
    n_gt_removed = 0
    valid_idx = np.flatnonzero(~g_ignored)
    ign_idx = np.flatnonzero(g_ignored)
    matched = np.zeros(len(gboxes), bool)
    if n_p and len(gboxes):
        ious = iou_fn(pboxes, gboxes)
    else:
        ious = np.zeros((n_p, len(gboxes)))
    for pi in np.argsort(-pscores):
        # best unmatched valid GT first (kitti prefers non-ignored)
        gi = -1
        if len(valid_idx):
            cand = valid_idx[~matched[valid_idx]]
            if len(cand):
                gi = cand[np.argmax(ious[pi, cand])]
        if gi >= 0 and ious[pi, gi] >= thr:
            matched[gi] = True
            if p_ignored[pi]:
                # ignored det absorbs a valid GT: neither TP nor FN
                keep[pi] = False
                n_gt_removed += 1
            else:
                flags[pi] = True
            continue
        # then ignored GT (difficulty/neighbor-class): det is dropped
        if len(ign_idx):
            cand = ign_idx[~matched[ign_idx]]
            if len(cand) and ious[pi, cand].max() >= thr:
                matched[cand[np.argmax(ious[pi, cand])]] = True
                keep[pi] = False
                continue
        if p_ignored[pi]:
            keep[pi] = False
    # DontCare: unmatched surviving dets overlapping a DC region are
    # dropped (not FP)
    if len(dc_boxes):
        cand = np.flatnonzero(keep & ~flags)
        if len(cand):
            ov = dc_overlap_fn(pboxes[cand], dc_boxes)
            keep[cand[ov.max(axis=1) >= thr]] = False
    return flags[keep], pscores[keep], n_gt_removed


def kitti_eval(
    gt_by_frame: Dict, pred_by_frame: Dict, class_names: Sequence[str],
    iou_thresholds: Dict[str, float] = None, metric: str = "3d",
    neighbor_ignores: Dict[str, Sequence[str]] = None,
) -> Dict[str, float]:
    """gt/pred_by_frame: {frame: dict(boxes (N, 7+) bottom-centered, labels
    (DONTCARE = -1 marks DontCare regions), scores (pred only), difficulty
    (gt, optional int 0/1/2, -1 = unknown), boxes2d (N, 4) [x1, y1, x2,
    y2] for metric="bbox")}."""
    iou_thresholds = dict(DEFAULT_IOU_THRESHOLDS if iou_thresholds is None
                          else iou_thresholds)
    if neighbor_ignores is None:
        neighbor_ignores = DEFAULT_NEIGHBOR_IGNORES
    name_to_idx = {n: i for i, n in enumerate(class_names)}
    if metric == "bbox":
        from cmtcoop_tpu.data.eval.kitti_format import iou_2d
        iou_fn = iou_2d
        box_key = "boxes2d"
        empty = np.zeros((0, 4))
        dc_overlap_fn = _overlap_over_area
    else:
        iou_fn = iou_3d if metric == "3d" else bev_iou
        box_key = "boxes"
        empty = np.zeros((0, 7))

        def dc_overlap_fn(p, dc):  # BEV-footprint DC filter (A9 adaptation)
            return bev_iou(p, dc)

    results = {}
    difficulties = [0, 1, 2, None]  # easy / moderate / hard / overall
    for ci, cls in enumerate(class_names):
        thr = iou_thresholds.get(cls, 0.5)
        ign_classes = {name_to_idx[n] for n in neighbor_ignores.get(cls, ())
                       if n in name_to_idx}
        for diff in difficulties:
            flags_all: List[np.ndarray] = []
            scores_all: List[np.ndarray] = []
            n_gt = 0
            for frame in gt_by_frame:
                gt = gt_by_frame[frame]
                pd = pred_by_frame.get(frame, {
                    box_key: empty, "labels": np.zeros(0, int),
                    "scores": np.zeros(0)})
                glabels = np.asarray(gt["labels"])
                # class tiers: this class / neighbor class / DontCare
                is_cls = glabels == ci
                is_nbr = (np.isin(glabels, list(ign_classes))
                          if ign_classes else np.zeros_like(is_cls))
                is_dc = glabels == DONTCARE
                gdiff = (np.asarray(gt["difficulty"])
                         if "difficulty" in gt
                         else np.zeros(len(glabels), int))
                if diff is not None:
                    hard_enough = (gdiff >= 0) & (gdiff <= diff)
                else:
                    hard_enough = np.ones(len(glabels), bool)
                in_play = is_cls | is_nbr
                g_ignored = (is_nbr | ~hard_enough)[in_play]
                gboxes = np.asarray(gt[box_key])[in_play]
                dc_boxes = np.asarray(gt[box_key])[is_dc]

                pmask = np.asarray(pd["labels"]) == ci
                pboxes = np.asarray(pd[box_key])[pmask]
                pscores = np.asarray(pd["scores"])[pmask]
                # min-height det filter (image-plane metric only)
                if metric == "bbox" and diff is not None and len(pboxes):
                    p_ignored = ((pboxes[:, 3] - pboxes[:, 1])
                                 < MIN_HEIGHT[diff])
                else:
                    p_ignored = np.zeros(len(pboxes), bool)

                n_gt += int((~g_ignored).sum())
                if len(pboxes) == 0:
                    continue
                flags, scores, removed = _frame_stats(
                    gboxes, g_ignored, pboxes, pscores, p_ignored,
                    dc_boxes, iou_fn, dc_overlap_fn, thr)
                n_gt -= removed
                flags_all.append(flags)
                scores_all.append(scores)
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
