"""Rotated box IoU (BEV polygon clipping + z overlap), pure numpy.

Used by the KITTI-style scorer (A9Dataset path, a9_kitti_dataset.py:298-364)
and available for analysis tooling. Convex polygon intersection via
Sutherland-Hodgman.
"""
from __future__ import annotations

import numpy as np

from cmtcoop_tpu.data.pipelines.box_np import corners_bev


def _clip_polygon(poly, a, b):
    """Clip polygon by half-plane left of segment a->b."""
    out = []
    n = len(poly)
    for i in range(n):
        p, q = poly[i], poly[(i + 1) % n]
        dp = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        dq = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
        if dp >= 0:
            out.append(p)
        if (dp >= 0) != (dq >= 0):
            t = dp / (dp - dq)
            out.append(p + t * (q - p))
    return out


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    x = np.asarray([p[0] for p in poly])
    y = np.asarray([p[1] for p in poly])
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _rect_intersection_area(ca, cb) -> float:
    """Intersection area of two convex quads (4, 2)."""
    poly = [np.asarray(p, np.float64) for p in ca]
    # ensure counter-clockwise ordering of the clip rect
    cb = np.asarray(cb, np.float64)
    area2 = (cb[1][0] - cb[0][0]) * (cb[2][1] - cb[0][1]) - (
        cb[1][1] - cb[0][1]) * (cb[2][0] - cb[0][0])
    if area2 < 0:
        cb = cb[::-1]
    for i in range(4):
        if not poly:
            return 0.0
        poly = _clip_polygon(poly, cb[i], cb[(i + 1) % 4])
    return _poly_area(poly)


def bev_iou(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """(Na, 7+), (Nb, 7+) -> (Na, Nb) rotated BEV IoU."""
    ca = corners_bev(boxes_a)
    cb = corners_bev(boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    # CCW ordering for clipping
    out = np.zeros((len(boxes_a), len(boxes_b)))
    for i in range(len(boxes_a)):
        for j in range(len(boxes_b)):
            inter = _rect_intersection_area(ca[i], cb[j])
            union = area_a[i] + area_b[j] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def iou_3d(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """(Na, 7+), (Nb, 7+) bottom-centered -> (Na, Nb) rotated 3D IoU."""
    ca = corners_bev(boxes_a)
    cb = corners_bev(boxes_b)
    out = np.zeros((len(boxes_a), len(boxes_b)))
    for i in range(len(boxes_a)):
        za0, za1 = boxes_a[i, 2], boxes_a[i, 2] + boxes_a[i, 5]
        vol_a = boxes_a[i, 3] * boxes_a[i, 4] * boxes_a[i, 5]
        for j in range(len(boxes_b)):
            zb0, zb1 = boxes_b[j, 2], boxes_b[j, 2] + boxes_b[j, 5]
            dz = min(za1, zb1) - max(za0, zb0)
            if dz <= 0:
                continue
            inter = _rect_intersection_area(ca[i], cb[j]) * dz
            vol_b = boxes_b[j, 3] * boxes_b[j, 4] * boxes_b[j, 5]
            union = vol_a + vol_b - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out
