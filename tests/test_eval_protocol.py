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


def _box(x, y, name, score=None, attr="", vel=(0.0, 0.0)):
    b = dict(translation=(x, y, 1.0), size=(2.0, 4.0, 1.5), yaw=0.0,
             velocity=vel, detection_name=name, ego_dist=float(np.hypot(x, y)),
             num_pts=10, timestamp=0, attribute_name=attr)
    if score is not None:
        b["detection_score"] = score
    return b


def test_nuscenes_protocol_attr_err_and_nds10():
    """protocol="nuscenes": mAAE from attribute_name, NDS over 10."""
    from cmtcoop_tpu.data.eval.nusc_protocol import evaluate_detection

    gt = {0: [_box(0, 0, "car", attr="vehicle.parked"),
              _box(10, 0, "car", attr="vehicle.moving")]}
    # perfect boxes; one attribute right, one wrong
    pred = {0: [_box(0, 0, "car", 0.9, attr="vehicle.parked"),
                _box(10, 0, "car", 0.8, attr="vehicle.parked")]}
    cls_range = {"car": 50}
    res = evaluate_detection(
        {k: list(v) for k, v in gt.items()},
        {k: list(v) for k, v in pred.items()},
        ["car"], cls_range=cls_range, protocol="nuscenes")
    assert res["mean_ap"] > 0.9
    # one of two attributes wrong -> 0 < mAAE < 1 (cummean-interpolated
    # TP curve, devkit semantics)
    assert 0.1 < res["tp_errors"]["attr_err"] < 0.9
    # exact endpoints: all-wrong -> 1.0, all-right -> 0.0
    pw = {0: [_box(0, 0, "car", 0.9, attr="vehicle.moving"),
              _box(10, 0, "car", 0.8, attr="vehicle.parked")]}
    rw = evaluate_detection(
        {k: list(v) for k, v in gt.items()}, pw, ["car"],
        cls_range=cls_range, protocol="nuscenes")
    assert abs(rw["tp_errors"]["attr_err"] - 1.0) < 1e-9
    pr = {0: [_box(0, 0, "car", 0.9, attr="vehicle.parked"),
              _box(10, 0, "car", 0.8, attr="vehicle.moving")]}
    rr = evaluate_detection(
        {k: list(v) for k, v in gt.items()}, pr, ["car"],
        cls_range=cls_range, protocol="nuscenes")
    assert abs(rr["tp_errors"]["attr_err"]) < 1e-9
    # NDS denominator is 10 (5*mAP + 5 tp scores)
    expect = (5 * res["mean_ap"] + sum(
        max(0.0, 1.0 - res["tp_errors"][m]) for m in
        ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")
    )) / 10.0
    assert abs(res["nd_score"] - expect) < 1e-9


def test_nuscenes_protocol_class_exclusions():
    """Cones score no orient/vel/attr error; barriers no vel/attr; the
    excluded entries are NaN and drop out of the means (devkit rule)."""
    from cmtcoop_tpu.data.eval.nusc_protocol import evaluate_detection

    gt = {0: [_box(0, 0, "traffic_cone"), _box(10, 0, "barrier"),
              _box(20, 0, "car", attr="vehicle.parked")]}
    pred = {0: [_box(0, 0, "traffic_cone", 0.9),
                _box(10, 0, "barrier", 0.9),
                _box(20, 0, "car", 0.9, attr="vehicle.parked")]}
    cr = {"traffic_cone": 30, "barrier": 30, "car": 50}
    res = evaluate_detection(
        gt, pred, ["traffic_cone", "barrier", "car"], cls_range=cr,
        protocol="nuscenes")
    lte = res["label_tp_errors"]
    assert np.isnan(lte["traffic_cone"]["orient_err"])
    assert np.isnan(lte["traffic_cone"]["vel_err"])
    assert np.isnan(lte["traffic_cone"]["attr_err"])
    assert np.isnan(lte["barrier"]["vel_err"])
    assert np.isnan(lte["barrier"]["attr_err"])
    assert not np.isnan(lte["barrier"]["orient_err"])
    # means ignore the NaNs: only the car contributes to mAAE, and its
    # attribute matches -> mAAE 0
    assert res["tp_errors"]["attr_err"] < 0.05


def test_a9_protocol_unchanged_by_attr_fields():
    """Default protocol stays the reference's 4-metric / NDS-over-9."""
    from cmtcoop_tpu.data.eval.nusc_protocol import evaluate_detection

    gt = {0: [_box(0, 0, "CAR")]}
    pred = {0: [_box(0, 0, "CAR", 0.9)]}
    res = evaluate_detection(gt, pred, ["CAR"],
                             cls_range={"CAR": 50})
    assert "attr_err" not in res["tp_errors"]
    expect = (5 * res["mean_ap"] + sum(
        max(0.0, 1.0 - res["tp_errors"][m]) for m in
        ("trans_err", "scale_err", "orient_err", "vel_err"))) / 9.0
    assert abs(res["nd_score"] - expect) < 1e-9
