"""KITTI-format result export + image-plane 2D boxes.

Rebuild of the reference's `bbox2result_kitti` / `bbox2result_kitti2d`
(a9_kitti_dataset.py:421-570) and the 2D-projection step of mmdet3d's
`convert_valid_bboxes`: 3D lidar boxes -> KITTI anno dicts (name, truncated,
occluded, alpha, bbox, dimensions, location, rotation_y, score) and the
KITTI submission txt format (a9_kitti_dataset.py:506-525).

Box convention in: (x, y, z_bottom, sx, sy, sz, yaw[, vx, vy]) lidar frame,
sx = size along heading (length), sy = width, sz = height.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from cmtcoop_tpu.data.pipelines.box_np import corners_bev


def corners_3d(boxes: np.ndarray) -> np.ndarray:
    """(N, 7+) bottom-centered -> (N, 8, 3): bottom 4 then top 4."""
    bev = corners_bev(boxes)  # (N, 4, 2)
    n = len(boxes)
    z0 = np.repeat(boxes[:, 2:3], 4, axis=1)
    z1 = z0 + boxes[:, 5:6]
    bottom = np.concatenate([bev, z0[..., None]], -1)
    top = np.concatenate([bev, z1[..., None]], -1)
    return np.concatenate([bottom, top], axis=1)


def project_boxes_to_image(
        boxes: np.ndarray, lidar2img: np.ndarray,
        image_shape: Sequence[int]):
    """Project 3D boxes through a 4x4 lidar2img; returns (bbox2d (N, 4)
    clipped [x1, y1, x2, y2], valid (N,) bool).

    Matches mmdet3d convert_valid_bboxes: a box is valid when at least one
    corner is in front of the camera and the projected rectangle overlaps
    the image."""
    h, w = int(image_shape[0]), int(image_shape[1])
    if len(boxes) == 0:
        return np.zeros((0, 4), np.float32), np.zeros(0, bool)
    corners = corners_3d(boxes)  # (N, 8, 3)
    hom = np.concatenate(
        [corners, np.ones_like(corners[..., :1])], -1)  # (N, 8, 4)
    proj = hom @ lidar2img.T
    z = proj[..., 2]
    front = z > 1e-3
    zc = np.clip(z, 1e-3, None)
    uv = proj[..., :2] / zc[..., None]
    # ignore behind-camera corners for the extent
    big = np.where(front, uv[..., 0], np.inf)
    small = np.where(front, uv[..., 0], -np.inf)
    x1 = big.min(axis=1)
    x2 = small.max(axis=1)
    big = np.where(front, uv[..., 1], np.inf)
    small = np.where(front, uv[..., 1], -np.inf)
    y1 = big.min(axis=1)
    y2 = small.max(axis=1)
    bbox = np.stack([x1, y1, x2, y2], -1)
    valid = (front.any(axis=1) & (bbox[:, 0] < w) & (bbox[:, 1] < h)
             & (bbox[:, 2] > 0) & (bbox[:, 3] > 0))
    bbox[:, 0::2] = np.clip(bbox[:, 0::2], 0, w)
    bbox[:, 1::2] = np.clip(bbox[:, 1::2], 0, h)
    return bbox.astype(np.float32), valid


def _empty_anno() -> Dict[str, np.ndarray]:
    return {
        "name": np.array([]), "truncated": np.array([]),
        "occluded": np.array([]), "alpha": np.array([]),
        "bbox": np.zeros([0, 4]), "dimensions": np.zeros([0, 3]),
        "location": np.zeros([0, 3]), "rotation_y": np.array([]),
        "score": np.array([]),
    }


def boxes_to_kitti_anno(
        boxes: np.ndarray, labels: np.ndarray, scores: np.ndarray,
        class_names: Sequence[str],
        lidar2img: Optional[np.ndarray] = None,
        image_shape: Optional[Sequence[int]] = None,
        sample_idx: int = 0) -> Dict[str, np.ndarray]:
    """Predictions -> one KITTI anno dict (bbox2result_kitti semantics).

    Without camera calib the 2D bbox falls back to the BEV footprint and
    alpha to -10, exactly like the reference's A9-KITTI label export
    (a9_converter.py:575-589); with `lidar2img` the bbox is the projected
    3D box and behind-camera boxes are dropped (mmdet3d
    convert_valid_bboxes)."""
    boxes = np.asarray(boxes, np.float32)
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    if len(boxes) == 0:
        anno = _empty_anno()
        anno["sample_idx"] = np.zeros(0, np.int64)
        return anno
    if lidar2img is not None:
        bbox2d, valid = project_boxes_to_image(
            boxes, np.asarray(lidar2img), image_shape)
        boxes, labels, scores = boxes[valid], labels[valid], scores[valid]
        bbox2d = bbox2d[valid]
        alpha = -np.arctan2(-boxes[:, 1], boxes[:, 0]) + boxes[:, 6]
    else:
        bbox2d = np.stack([
            boxes[:, 0] - boxes[:, 3] / 2, boxes[:, 1] - boxes[:, 4] / 2,
            boxes[:, 0] + boxes[:, 3] / 2, boxes[:, 1] + boxes[:, 4] / 2,
        ], -1)
        alpha = np.full(len(boxes), -10.0, np.float32)
    anno = {
        "name": np.asarray([class_names[int(i)] for i in labels]),
        "truncated": np.zeros(len(boxes), np.float32),
        "occluded": np.zeros(len(boxes), np.int64),
        "alpha": alpha.astype(np.float32),
        "bbox": bbox2d.astype(np.float32),
        # KITTI 'dimensions' field order (l, h, w); l = heading size sx
        "dimensions": boxes[:, [3, 5, 4]].astype(np.float32),
        "location": boxes[:, :3].astype(np.float32),
        "rotation_y": boxes[:, 6].astype(np.float32),
        "score": scores.astype(np.float32),
        "sample_idx": np.full(len(boxes), sample_idx, np.int64),
    }
    return anno


def write_kitti_txt(anno: Dict[str, np.ndarray], path: str) -> None:
    """KITTI submission txt (reference a9_kitti_dataset.py:506-525):
    name trunc occ alpha x1 y1 x2 y2 h w l x y z ry score."""
    with open(path, "w") as f:
        dims = anno["dimensions"]  # (l, h, w)
        for i in range(len(anno["score"])):
            bbox = anno["bbox"][i]
            loc = anno["location"][i]
            f.write(
                "{} -1 -1 {:.4f} {:.4f} {:.4f} {:.4f} {:.4f} {:.4f} "
                "{:.4f} {:.4f} {:.4f} {:.4f} {:.4f} {:.4f} {:.4f}\n".format(
                    anno["name"][i], anno["alpha"][i], bbox[0], bbox[1],
                    bbox[2], bbox[3], dims[i][1], dims[i][2], dims[i][0],
                    loc[0], loc[1], loc[2], anno["rotation_y"][i],
                    anno["score"][i]))


def export_kitti_results(
        pred_by_frame: Dict, class_names: Sequence[str],
        submission_dir: Optional[str] = None,
        calib_by_frame: Optional[Dict] = None,
        image_shape: Optional[Sequence[int]] = None) -> List[Dict]:
    """All frames -> list of KITTI annos (+ optional submission txts)."""
    if submission_dir:
        os.makedirs(submission_dir, exist_ok=True)
    det_annos = []
    for si, frame in enumerate(sorted(pred_by_frame)):
        pd = pred_by_frame[frame]
        l2i = (calib_by_frame or {}).get(frame)
        anno = boxes_to_kitti_anno(
            pd["boxes"], pd["labels"], pd["scores"], class_names,
            lidar2img=l2i, image_shape=image_shape, sample_idx=si)
        det_annos.append(anno)
        if submission_dir:
            write_kitti_txt(
                anno, os.path.join(submission_dir, f"{frame}.txt"))
    return det_annos


def iou_2d(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Axis-aligned [x1, y1, x2, y2] IoU, (Na, Nb)."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), np.float32)
    a = boxes_a[:, None]
    b = boxes_b[None]
    iw = np.clip(np.minimum(a[..., 2], b[..., 2])
                 - np.maximum(a[..., 0], b[..., 0]), 0, None)
    ih = np.clip(np.minimum(a[..., 3], b[..., 3])
                 - np.maximum(a[..., 1], b[..., 1]), 0, None)
    inter = iw * ih
    area_a = ((boxes_a[:, 2] - boxes_a[:, 0])
              * (boxes_a[:, 3] - boxes_a[:, 1]))[:, None]
    area_b = ((boxes_b[:, 2] - boxes_b[:, 0])
              * (boxes_b[:, 3] - boxes_b[:, 1]))[None]
    return (inter / np.maximum(area_a + area_b - inter, 1e-9)).astype(
        np.float32)
