"""Rotated IoU + KITTI AP tests with analytically-known values."""
import numpy as np

from cmtcoop_tpu.data.eval.kitti import kitti_eval
from cmtcoop_tpu.data.eval.rotated_iou import bev_iou, iou_3d


def _box(x, y, z, w, l, h, yaw):
    return np.array([x, y, z, w, l, h, yaw], np.float32)


def test_bev_iou_axis_aligned():
    a = _box(0, 0, 0, 2, 2, 1, 0)[None]
    b = _box(1, 0, 0, 2, 2, 1, 0)[None]
    iou = bev_iou(a, b)[0, 0]
    np.testing.assert_allclose(iou, 2.0 / 6.0, rtol=1e-5)


def test_bev_iou_rotated_45():
    # square rotated 45 deg inside same square: octagon intersection
    a = _box(0, 0, 0, 2, 2, 1, 0)[None]
    b = _box(0, 0, 0, 2, 2, 1, np.pi / 4)[None]
    inter = 4 * (np.sqrt(2) - 1) * 2  # known octagon area 8(sqrt2-1)
    iou = bev_iou(a, b)[0, 0]
    expected = inter / (4 + 4 - inter)
    np.testing.assert_allclose(iou, expected, rtol=1e-4)


def test_iou3d_z_overlap():
    a = _box(0, 0, 0, 2, 2, 2, 0)[None]
    b = _box(0, 0, 1, 2, 2, 2, 0)[None]  # half z overlap
    iou = iou_3d(a, b)[0, 0]
    np.testing.assert_allclose(iou, 4.0 / 12.0, rtol=1e-5)


def test_kitti_ap_perfect_and_miss():
    gt = {0: dict(boxes=np.stack([_box(0, 0, 0, 2, 4, 1.5, 0),
                                  _box(10, 0, 0, 2, 4, 1.5, 0)]),
                  labels=np.array([0, 0]))}
    pred = {0: dict(boxes=np.stack([_box(0, 0, 0, 2, 4, 1.5, 0)]),
                    labels=np.array([0]), scores=np.array([0.9]))}
    res = kitti_eval(gt, pred, ["CAR"], metric="3d")
    # recall caps at 0.5 -> AP40 sums precision 1.0 over the 20 recall
    # points <= 0.5
    assert abs(res["CAR_3d_overall"] - 50.0) < 2.6
    pred_perfect = {0: dict(
        boxes=gt[0]["boxes"], labels=np.array([0, 0]),
        scores=np.array([0.9, 0.8]))}
    res2 = kitti_eval(gt, pred_perfect, ["CAR"], metric="3d")
    assert res2["CAR_3d_overall"] == 100.0
