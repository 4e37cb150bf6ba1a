"""nuScenes dataset (CustomNuScenesDataset rebuild).

Reads standard mmdet3d `nuscenes_infos_{split}.pkl` files and augments each
sample with per-camera lidar2img/lidar2cam/intrinsic 4x4 matrices exactly as
the reference's CustomNuScenesDataset does
(datasets/custom_nuscenes_dataset.py:27-98). Evaluation reuses the in-repo
nuScenes-protocol scorer (same math as the devkit's CVPR-2019 config; the
reference shells out to the official devkit here, which this image lacks).
"""
from __future__ import annotations

import pickle
from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np

from cmtcoop_tpu.data.datasets import A9NuscCoopDataset
from cmtcoop_tpu.data.pipelines import transforms as T

NUSC_CLS_RANGE = {
    "car": 50, "truck": 50, "bus": 50, "trailer": 50,
    "construction_vehicle": 50, "pedestrian": 40, "motorcycle": 40,
    "bicycle": 40, "traffic_cone": 30, "barrier": 30,
}


class CustomNuScenesDataset(A9NuscCoopDataset):
    PREFIXES = ("",)

    def get_raw_sample(self, index: int, rng: np.random.Generator) -> Dict:
        info = self.infos[index]
        sample: Dict[str, Any] = dict(
            timestamp=info.get("timestamp", info.get("token", index)))
        if self.use_lidar:
            pts = T.load_points_bin(info["lidar_path"])
            pts = T.load_multi_sweeps(
                pts, info.get("sweeps", []), rng, test_mode=self.test_mode)
            sample["points"] = pts
        if self.use_camera:
            imgs, l2i, l2c, intr = [], [], [], []
            for _, cam in info["cams"].items():
                imgs.append(T.load_image(cam["data_path"]))
                # sensor2lidar R/t -> lidar2cam -> lidar2img
                # (custom_nuscenes_dataset.py:47-78)
                c2l = np.eye(4)
                c2l[:3, :3] = np.asarray(cam["sensor2lidar_rotation"])
                c2l[:3, 3] = np.asarray(cam["sensor2lidar_translation"])
                lidar2cam = np.linalg.inv(c2l)
                k4 = np.eye(4)
                k4[:3, :3] = np.asarray(cam["cam_intrinsic"])[:3, :3]
                l2c.append(lidar2cam.astype(np.float32))
                intr.append(k4.astype(np.float32))
                l2i.append((k4 @ lidar2cam).astype(np.float32))
            sample["img_list"] = imgs
            sample["lidar2img"] = np.stack(l2i)
            sample["lidar2cam"] = np.stack(l2c)
            sample["cam_intrinsic"] = np.stack(intr)
        if not self.test_mode:
            mask = np.asarray(info.get(
                "valid_flag", np.asarray(info["num_lidar_pts"]) > 0))
            boxes = np.asarray(info["gt_boxes"], np.float32)[mask]
            names = np.asarray(info["gt_names"])[mask]
            vel = np.nan_to_num(
                np.asarray(info["gt_velocity"], np.float32)[mask])
            # nuScenes infos store bottom-centered boxes already (mmdet3d
            # origin (0.5, 0.5, 0) convention after its converter)
            boxes = (np.concatenate([boxes, vel], axis=-1)
                     if len(boxes) else np.zeros((0, 9), np.float32))
            labels = np.asarray(
                [self.class_names.index(n) if n in self.class_names else -1
                 for n in names], np.int64)
            keep = labels >= 0
            sample["gt_boxes_3d"] = boxes[keep]
            sample["gt_labels_3d"] = labels[keep]
            sample["gt_names"] = [str(n) for n in names[keep]]
        return sample

    def gt_eval_boxes(self) -> Dict:
        out = {}
        for idx, info in enumerate(self.infos):
            ts = info.get("timestamp", info.get("token", idx))
            mask = np.asarray(info.get(
                "valid_flag", np.asarray(info["num_lidar_pts"]) > 0))
            boxes = np.asarray(info["gt_boxes"], np.float32)[mask]
            names = np.asarray(info["gt_names"])[mask]
            vel = np.nan_to_num(
                np.asarray(info["gt_velocity"], np.float32)[mask])
            npts = np.asarray(info["num_lidar_pts"])[mask]
            entries = []
            for b, n, v, np_ in zip(boxes, names, vel, npts):
                entries.append(dict(
                    translation=(float(b[0]), float(b[1]),
                                 float(b[2] + b[5] / 2)),
                    size=(float(b[3]), float(b[4]), float(b[5])),
                    yaw=float(b[6]), velocity=(float(v[0]), float(v[1])),
                    detection_name=str(n),
                    ego_dist=float(np.hypot(b[0], b[1])),
                    num_pts=int(np_), timestamp=ts))
            out[ts] = entries
        return out

    def evaluate(self, pred_boxes_by_ts: Dict) -> Dict:
        from cmtcoop_tpu.data.eval.nusc_protocol import evaluate_detection
        gt = self.gt_eval_boxes()
        for ts in gt:
            pred_boxes_by_ts.setdefault(ts, [])
        return evaluate_detection(
            gt, pred_boxes_by_ts, self.class_names,
            cls_range=NUSC_CLS_RANGE, protocol="nuscenes")
