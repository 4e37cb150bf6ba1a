"""Eval artifacts (results_nusc/metrics_summary/metrics_details) + TB
event-file writer."""
import json
import os
import struct

import numpy as np

from cmtcoop_tpu.data.eval.nusc_protocol import (
    evaluate_detection, write_results_nusc)
from cmtcoop_tpu.utils.tb_writer import (
    TensorBoardWriter, _masked_crc, crc32c)


def _box(x, y, name, score=None):
    b = dict(translation=(x, y, 0.5), size=(1.9, 4.5, 1.6), yaw=0.1,
             velocity=(0.0, 0.0), detection_name=name, ego_dist=5.0,
             num_pts=10, timestamp="t0")
    if score is not None:
        b["detection_score"] = score
    return b


def test_eval_artifacts_written(tmp_path):
    gt = {"t0": [_box(5, 0, "CAR"), _box(10, 2, "CAR")]}
    preds = {"t0": [_box(5.1, 0, "CAR", 0.9), _box(10.2, 2, "CAR", 0.8)]}
    out = str(tmp_path / "work")
    summary = evaluate_detection(gt, preds, ["CAR"], output_dir=out)
    assert summary["mean_ap"] > 0.9

    ms = json.load(open(os.path.join(out, "metrics_summary.json")))
    assert ms["mean_ap"] == summary["mean_ap"]
    assert ms["nd_score"] == summary["nd_score"]
    assert "label_aps" in ms and "cfg" in ms
    assert "detail" not in ms  # summary artifact stays reference-shaped

    md = json.load(open(os.path.join(out, "metrics_details.json")))
    assert "CAR:0.5" in md and "CAR:4.0" in md
    curve = md["CAR:2.0"]
    assert len(curve["recall"]) == 101
    assert len(curve["precision"]) == 101

    path = write_results_nusc(preds, out, meta={"use_lidar": True})
    rn = json.load(open(path))
    assert rn["meta"] == {"use_lidar": True}
    assert len(rn["results"]["t0"]) == 2
    a = rn["results"]["t0"][0]
    assert a["detection_name"] == "CAR"
    # yaw quaternion (w, 0, 0, sin(yaw/2))
    np.testing.assert_allclose(a["rotation"][0], np.cos(0.05), atol=1e-6)
    np.testing.assert_allclose(a["rotation"][3], np.sin(0.05), atol=1e-6)


def test_crc32c_vector():
    # RFC 3720 test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            (length,) = struct.unpack("<Q", hdr)
            (crc_h,) = struct.unpack("<I", f.read(4))
            assert crc_h == _masked_crc(hdr)
            data = f.read(length)
            (crc_d,) = struct.unpack("<I", f.read(4))
            assert crc_d == _masked_crc(data)
            records.append(data)
    return records


def test_tb_writer_records(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    w.add_scalars(1, {"train/loss": 3.25})
    w.add_scalars(2, {"train/loss": 2.5, "train/lr": 1e-4})
    w.close()
    recs = _read_records(w.path)
    assert len(recs) == 3  # file_version + 2 scalar events
    assert b"brain.Event:2" in recs[0]
    assert b"train/loss" in recs[1]
    # simple_value float 3.25 little-endian appears in the first event
    assert struct.pack("<f", 3.25) in recs[1]
    assert b"train/lr" in recs[2]
