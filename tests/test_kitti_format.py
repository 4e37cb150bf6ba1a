"""KITTI parity tail: 2D projection/export, bbox AP, A92KITTI converter."""
import json
import os

import numpy as np

from cmtcoop_tpu.data.eval.kitti import kitti_eval
from cmtcoop_tpu.data.eval.kitti_format import (
    boxes_to_kitti_anno, export_kitti_results, iou_2d,
    project_boxes_to_image, write_kitti_txt)
from cmtcoop_tpu.data.kitti_dataset import A9KittiDataset, parse_kitti_label


def _pinhole_l2i(f=100.0, cx=320.0, cy=240.0):
    """lidar (x fwd, y left, z up) -> image: u = cx - f*y/x, v = cy - f*z/x."""
    k = np.zeros((4, 4), np.float32)
    k[0, 1], k[0, 0], k[0, 3] = -f, cx, 0  # u*depth = -f*y + cx*x
    k[1, 2], k[1, 0] = -f, cy
    k[2, 0] = 1.0                          # depth = x
    k[3, 3] = 1.0
    return k


def test_project_boxes_front_and_behind():
    l2i = _pinhole_l2i()
    boxes = np.array([
        [10.0, 0.0, -1.0, 2.0, 2.0, 2.0, 0.0],   # ahead, centered
        [-10.0, 0.0, -1.0, 2.0, 2.0, 2.0, 0.0],  # behind camera
    ], np.float32)
    bbox, valid = project_boxes_to_image(boxes, l2i, (480, 640))
    assert valid.tolist() == [True, False]
    # corners at x in {9, 11}, y in {-1, 1}, z in {-1, 1}:
    # u = 320 -+ 100*y/x -> [320 - 100/9, 320 + 100/9]
    np.testing.assert_allclose(bbox[0, 0], 320 - 100 / 9, rtol=1e-5)
    np.testing.assert_allclose(bbox[0, 2], 320 + 100 / 9, rtol=1e-5)
    np.testing.assert_allclose(bbox[0, 1], 240 - 100 / 9, rtol=1e-5)
    np.testing.assert_allclose(bbox[0, 3], 240 + 100 / 9, rtol=1e-5)


def test_kitti_txt_roundtrip(tmp_path):
    """write_kitti_txt output parses back with identical boxes."""
    boxes = np.array([
        [5.0, 2.0, -1.5, 4.2, 1.9, 1.6, 0.3],
        [-3.0, 8.0, -1.2, 0.8, 0.6, 1.7, -1.1],
    ], np.float32)
    labels = np.array([0, 1])
    scores = np.array([0.9, 0.4], np.float32)
    anno = boxes_to_kitti_anno(boxes, labels, scores, ("CAR", "PEDESTRIAN"))
    path = str(tmp_path / "000000.txt")
    write_kitti_txt(anno, path)
    got, glabels, _ = parse_kitti_label(path, ["CAR", "PEDESTRIAN"])
    np.testing.assert_allclose(got[:, :7], boxes, atol=0.01)
    assert glabels.tolist() == [0, 1]
    # scores present as the 16th column (submission format)
    with open(path) as f:
        parts = f.readline().split()
    assert len(parts) == 16 and abs(float(parts[15]) - 0.9) < 1e-3


def test_bbox_2d_ap():
    """metric='bbox': perfect match -> 100, shifted misses -> 0."""
    gt = {"f0": dict(
        boxes2d=np.array([[0, 0, 10, 10], [20, 20, 40, 44]], np.float32),
        labels=np.array([0, 0]))}
    pred_good = {"f0": dict(
        boxes2d=gt["f0"]["boxes2d"].copy(), labels=np.array([0, 0]),
        scores=np.array([0.9, 0.8]))}
    res = kitti_eval(gt, pred_good, ["CAR"], metric="bbox")
    assert res["CAR_bbox_overall"] == 100.0
    pred_bad = {"f0": dict(
        boxes2d=gt["f0"]["boxes2d"] + 100.0, labels=np.array([0, 0]),
        scores=np.array([0.9, 0.8]))}
    res = kitti_eval(gt, pred_bad, ["CAR"], metric="bbox")
    assert res["CAR_bbox_overall"] == 0.0


def test_iou_2d_values():
    a = np.array([[0, 0, 2, 2]], np.float32)
    b = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], np.float32)
    iou = iou_2d(a, b)
    np.testing.assert_allclose(iou[0], [1 / 7, 1.0, 0.0], atol=1e-6)


def _write_openlabel(path, cuboids):
    objs = {}
    for i, (loc, dims, yaw, cls, occ) in enumerate(cuboids):
        from scipy.spatial.transform import Rotation
        q = Rotation.from_euler("z", yaw).as_quat()  # (x, y, z, w)
        objs[str(i)] = {"object_data": {
            "type": cls,
            "cuboid": {
                "val": list(loc) + list(q) + list(dims),
                "attributes": {
                    "num": [{"name": "num_points", "val": 50}],
                    "text": [{"name": "occlusion_level", "val": occ}],
                },
            },
        }}
    data = {"openlabel": {"frames": {"0": {
        "frame_properties": {"timestamp": 1234},
        "objects": objs,
    }}}}
    with open(path, "w") as f:
        json.dump(data, f)


def _write_ascii_pcd(path, pts):
    with open(path, "w") as f:
        f.write("VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
                "TYPE F F F F\nCOUNT 1 1 1 1\n"
                f"WIDTH {len(pts)}\nHEIGHT 1\n"
                f"POINTS {len(pts)}\nDATA ascii\n")
        for p in pts:
            f.write(" ".join(f"{v:.4f}" for v in p) + "\n")


def test_a9_kitti_converter_end_to_end(tmp_path, rng):
    """OpenLabel tree -> KITTI layout -> dataset load -> perfect-pred eval."""
    from cmtcoop_tpu.data.converters import a9_kitti

    raw = tmp_path / "raw"
    pc_dir = raw / "train" / "point_clouds" / a9_kitti.INFRA_LIDAR_DIR
    lb_dir = raw / "train" / "labels_point_clouds" / a9_kitti.INFRA_LIDAR_DIR
    os.makedirs(pc_dir)
    os.makedirs(lb_dir)
    cuboids = [
        ((5.0, 2.0, 0.0), (4.2, 1.9, 1.6), 0.3, "CAR", "NOT_OCCLUDED"),
        ((-3.0, 8.0, -0.3), (0.8, 0.6, 1.7), -1.1, "PEDESTRIAN",
         "MOSTLY_OCCLUDED"),
    ]
    for ts in ("1000", "1001"):
        _write_ascii_pcd(pc_dir / f"{ts}.pcd",
                         rng.normal(size=(30, 4)).astype(np.float32))
        _write_openlabel(lb_dir / f"{ts}.json", cuboids)

    out = tmp_path / "kitti"
    ids = a9_kitti.convert_split(str(raw), str(out), "training")
    assert ids == ["1000", "1001"]
    assert os.path.exists(out / "train" / "velodyne" / "1000.bin")
    assert os.path.exists(out / "ImageSets" / "train.txt")

    ds = A9KittiDataset(str(out), "train", ("CAR", "PEDESTRIAN"))
    assert len(ds) == 2
    s = ds[0]
    assert s["points"].shape[1] == 5
    boxes = s["gt_boxes_3d"]
    assert boxes.shape == (2, 9)
    # z shifted to bottom, dims (l, w, h) in cols 3:6, occlusion -> difficulty
    np.testing.assert_allclose(boxes[0, :7],
                               [5.0, 2.0, -0.8, 4.2, 1.9, 1.6, 0.3],
                               atol=0.01)
    assert s["gt_difficulty"].tolist() == [0, 2]

    # perfect predictions -> mAP 100 on both 3d and bev
    preds = {fid: dict(boxes=boxes.copy(), labels=np.array([0, 1]),
                       scores=np.array([0.9, 0.8]))
             for fid, boxes in ((f, ds[i]["gt_boxes_3d"])
                                for i, f in enumerate(ds.ids))}
    res = ds.evaluate(preds, metric="3d")
    assert res["mAP_3d_overall"] == 100.0

    # KITTI-format export of those predictions parses back
    annos = export_kitti_results(
        preds, ("CAR", "PEDESTRIAN"), submission_dir=str(tmp_path / "sub"))
    assert len(annos) == 2
    assert os.path.exists(tmp_path / "sub" / "1000.txt")
    got, glabels, _ = parse_kitti_label(
        str(tmp_path / "sub" / "1000.txt"), ["CAR", "PEDESTRIAN"])
    np.testing.assert_allclose(got[:, :7], preds["1000"]["boxes"][:, :7],
                               atol=0.01)
