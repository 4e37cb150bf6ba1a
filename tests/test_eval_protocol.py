"""Tests for the nuScenes-protocol scorer: exact values on crafted inputs."""
import numpy as np

from cmtcoop_tpu.data.eval.nusc_protocol import (accumulate, calc_ap,
                                                 evaluate_detection)


def _box(x, y, name, score=None, wlh=(2.0, 4.0, 1.5), yaw=0.0, vel=(0, 0),
         npts=5):
    b = dict(translation=(x, y, 0.0), size=wlh, yaw=yaw, velocity=vel,
             detection_name=name, ego_dist=float(np.hypot(x, y)),
             num_pts=npts, timestamp=None)
    if score is not None:
        b["detection_score"] = score
    return b


def _with_ts(d):
    for ts, boxes in d.items():
        for b in boxes:
            b["timestamp"] = ts
    return d


def test_perfect_predictions_score_one():
    gt, pred = {}, {}
    for ts in range(3):
        gt[ts] = [_box(10 + i, 5, "CAR") for i in range(4)]
        pred[ts] = [_box(10 + i, 5, "CAR", score=0.9 - 0.1 * i)
                    for i in range(4)]
    _with_ts(gt), _with_ts(pred)
    s = evaluate_detection(gt, pred, ["CAR"])
    assert abs(s["mean_ap"] - 1.0) < 1e-6
    assert abs(s["nd_score"] - 1.0) < 1e-6
    assert s["tp_errors"]["trans_err"] == 0.0


def test_no_predictions_zero():
    gt = _with_ts({0: [_box(10, 5, "CAR")]})
    pred = {0: []}
    s = evaluate_detection(gt, pred, ["CAR"])
    assert s["mean_ap"] == 0.0
    # all TP errors are 1 -> tp_scores 0 -> NDS = 0
    assert s["nd_score"] == 0.0


def test_half_recall_ap():
    # 2 GT, 1 perfect pred -> recall 0.5, precision 1 up to there
    gt = _with_ts({0: [_box(10, 0, "CAR"), _box(20, 0, "CAR")]})
    pred = _with_ts({0: [_box(10, 0, "CAR", score=0.9)]})
    md = accumulate(gt, pred, "CAR", 2.0)
    ap = calc_ap(md, 0.1, 0.1)
    # precision 1.0 for recall bins (0.1, 0.5], 0 after; bins 11..50 of 100
    prec = np.zeros(101)
    prec[:51] = 1.0
    manual = np.mean(np.clip(prec[11:] - 0.1, 0, None)) / 0.9
    assert abs(ap - manual) < 1e-9


def test_distance_threshold_matters():
    gt = _with_ts({0: [_box(10, 0, "CAR")]})
    pred = _with_ts({0: [_box(10, 1.5, "CAR", score=0.9)]})  # 1.5 m off
    s = evaluate_detection(gt, pred, ["CAR"])
    aps = s["label_aps"]["CAR"]
    assert aps[0.5] == 0.0 and aps[1.0] == 0.0
    assert aps[2.0] > 0.5 and aps[4.0] > 0.5


def test_range_filter_drops_far_boxes():
    gt = _with_ts({0: [_box(100, 0, "CAR"), _box(10, 0, "CAR")]})
    pred = _with_ts({0: [_box(10, 0, "CAR", score=0.9)]})
    s = evaluate_detection(gt, pred, ["CAR"])
    assert abs(s["mean_ap"] - 1.0) < 1e-6  # far GT filtered at 50 m


def test_class_confusion_is_fp():
    gt = _with_ts({0: [_box(10, 0, "CAR"), _box(20, 0, "TRUCK")]})
    pred = _with_ts({0: [_box(20, 0, "CAR", score=0.9)]})
    s = evaluate_detection(gt, pred, ["CAR", "TRUCK"])
    assert s["label_aps"]["CAR"][4.0] == 0.0
    assert s["label_aps"]["TRUCK"][4.0] == 0.0
    assert "object/map" in s["detail"] and "object/nds" in s["detail"]
