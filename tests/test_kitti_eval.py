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


# ---------------- KITTI ignored-box protocol (mmdet3d semantics) ------------


def _one_frame(gt_boxes, gt_labels, gt_diff, pred_boxes, pred_scores,
               pred_labels=None):
    gt = {0: dict(boxes=np.asarray(gt_boxes, np.float32),
                  labels=np.asarray(gt_labels),
                  difficulty=np.asarray(gt_diff))}
    pred = {0: dict(boxes=np.asarray(pred_boxes, np.float32),
                    labels=np.asarray(
                        pred_labels if pred_labels is not None
                        else np.zeros(len(pred_boxes), int)),
                    scores=np.asarray(pred_scores))}
    return gt, pred


def test_difficulty_is_cumulative():
    """At moderate, easy GT still counts as valid (kitti clean_data
    thresholds are per-level cumulative, not an equality bucket)."""
    gt, pred = _one_frame(
        [_box(0, 0, 0, 2, 4, 1.5, 0)], [0], [0],        # easy GT
        [_box(0, 0, 0, 2, 4, 1.5, 0)], [0.9])
    res = kitti_eval(gt, pred, ["CAR"], metric="3d")
    assert res["CAR_3d_easy"] == 100.0
    assert res["CAR_3d_moderate"] == 100.0   # easy GT valid at moderate
    assert res["CAR_3d_hard"] == 100.0


def test_harder_gt_is_ignored_not_fp():
    """A det matching GT above the current difficulty is neither TP nor
    FP, and that GT is not in the recall denominator — AP at easy equals
    the run with the hard GT and its det absent entirely."""
    easy_gt = _box(0, 0, 0, 2, 4, 1.5, 0)
    hard_gt = _box(20, 0, 0, 2, 4, 1.5, 0)
    gt, pred = _one_frame(
        [easy_gt, hard_gt], [0, 0], [0, 2],
        # det on hard GT outscores the easy det: would crater easy-AP
        # if counted as FP
        [easy_gt, hard_gt], [0.8, 0.9])
    res = kitti_eval(gt, pred, ["CAR"], metric="3d")
    gt2, pred2 = _one_frame([easy_gt], [0], [0], [easy_gt], [0.8])
    res2 = kitti_eval(gt2, pred2, ["CAR"], metric="3d")
    assert res["CAR_3d_easy"] == res2["CAR_3d_easy"] == 100.0
    # at hard, both count
    assert res["CAR_3d_hard"] == 100.0


def test_unknown_difficulty_gt_ignored_at_all_levels():
    gt, pred = _one_frame(
        [_box(0, 0, 0, 2, 4, 1.5, 0)], [0], [-1],
        [_box(0, 0, 0, 2, 4, 1.5, 0)], [0.9])
    res = kitti_eval(gt, pred, ["CAR"], metric="3d")
    for tag in ("easy", "moderate", "hard"):
        assert res[f"CAR_3d_{tag}"] == 0.0  # no valid GT -> AP 0, no FP
    assert res["CAR_3d_overall"] == 100.0   # overall has no diff filter


def test_neighbor_class_gt_ignored():
    """A CAR det landing on a VAN GT is dropped, not an FP (kitti
    Car<-Van ignore)."""
    car_gt = _box(0, 0, 0, 2, 4, 1.5, 0)
    van_gt = _box(20, 0, 0, 2, 5, 2.0, 0)
    gt, pred = _one_frame(
        [car_gt, van_gt], [0, 1], [0, 0],
        [car_gt, van_gt], [0.8, 0.9])    # van det outscores car det
    res = kitti_eval(gt, pred, ["CAR", "VAN"], metric="3d")
    assert res["CAR_3d_overall"] == 100.0
    # control: an unrelated class is NOT ignored -> the stray det is FP
    # at the top of the PR list, so precision at every recall is 0.5
    res2 = kitti_eval(gt, pred, ["CAR", "TRUCK"], metric="3d",
                      neighbor_ignores={})
    assert res2["CAR_3d_overall"] < 100.0


def test_dontcare_absorbs_fp():
    """An otherwise-FP det overlapping a DontCare region (label -1) is
    dropped."""
    car_gt = _box(0, 0, 0, 2, 4, 1.5, 0)
    dc = _box(20, 0, 0, 4, 8, 3.0, 0)
    stray = _box(20, 0, 0, 4, 8, 3.0, 0)
    gt, pred = _one_frame(
        [car_gt, dc], [0, -1], [0, 0],
        [car_gt, stray], [0.8, 0.9])
    res = kitti_eval(gt, pred, ["CAR"], metric="3d")
    assert res["CAR_3d_overall"] == 100.0
    # control: without the DC row the stray det is a top-scored FP
    gt2, pred2 = _one_frame([car_gt], [0], [0],
                            [car_gt, stray], [0.8, 0.9])
    res2 = kitti_eval(gt2, pred2, ["CAR"], metric="3d")
    assert res2["CAR_3d_overall"] < 100.0


def _bbox_frame(gt_boxes2d, gt_labels, gt_diff, pd_boxes2d, pd_scores):
    gt = {0: dict(boxes2d=np.asarray(gt_boxes2d, np.float32),
                  labels=np.asarray(gt_labels),
                  difficulty=np.asarray(gt_diff))}
    pred = {0: dict(boxes2d=np.asarray(pd_boxes2d, np.float32),
                    labels=np.zeros(len(pd_boxes2d), int),
                    scores=np.asarray(pd_scores))}
    return gt, pred


def test_min_height_det_filter_bbox():
    """metric="bbox": a det shorter than MIN_HEIGHT px is ignored — not an
    FP, and a valid GT it matches leaves the recall denominator."""
    tall_gt = [0, 0, 60, 60]       # 60 px high
    short_gt = [100, 0, 160, 30]   # 30 px: valid at moderate, short det
    gt, pred = _bbox_frame(
        [tall_gt, short_gt], [0, 0], [0, 1],
        [tall_gt, short_gt], [0.8, 0.9])
    res = kitti_eval(gt, pred, ["CAR"], metric="bbox")
    # easy (min 40px): short det ignored; its GT is difficulty-ignored
    # anyway -> only the tall pair counts
    assert res["CAR_bbox_easy"] == 100.0
    # moderate (min 25px): 30 px det is tall enough -> both TP
    assert res["CAR_bbox_moderate"] == 100.0
    # a 20px det matching a valid-at-hard GT: det ignored, GT leaves the
    # denominator -> AP stays 100 on the remaining pair
    gt2, pred2 = _bbox_frame(
        [tall_gt, [100, 0, 160, 20]], [0, 0], [0, 2],
        [tall_gt, [100, 0, 160, 20]], [0.8, 0.9])
    res2 = kitti_eval(gt2, pred2, ["CAR"], metric="bbox")
    assert res2["CAR_bbox_hard"] == 100.0
