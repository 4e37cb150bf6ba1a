#!/usr/bin/env python
"""Production-style inference -> OpenLabel JSON per frame.

Rebuild of tools/inference_to_openlabel_coop.py:302-506 (and the single-agent
variant): run the detector over a split and write one OpenLabel JSON per
frame with cuboids (center, quaternion from yaw, dimensions), detection
scores and per-box point counts.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def yaw_to_quat_xyzw(yaw: float):
    return [0.0, 0.0, float(np.sin(yaw / 2.0)), float(np.cos(yaw / 2.0))]


def boxes_to_openlabel(boxes9, scores, labels, class_names, timestamp,
                       num_points=None):
    """Bottom-centered box9 rows -> OpenLabel frame dict
    (inference_to_openlabel_coop.py:174-283)."""
    objects = {}
    for i, b in enumerate(boxes9):
        attrs = {
            "num": [{"name": "num_points",
                     "val": int(num_points[i]) if num_points is not None
                     else -1},
                    {"name": "score", "val": float(scores[i])}],
            "text": [], "boolean": []}
        objects[str(i)] = {
            "object_data": {
                "name": f"{class_names[int(labels[i])]}_{i}",
                "type": class_names[int(labels[i])],
                "cuboid": {
                    "val": [float(b[0]), float(b[1]),
                            float(b[2] + b[5] / 2.0),
                            *yaw_to_quat_xyzw(-float(b[6])),
                            float(b[3]), float(b[4]), float(b[5])],
                    "attributes": attrs,
                },
            }
        }
    return {
        "openlabel": {
            "metadata": {"schema_version": "1.0.0"},
            "frames": {
                "0": {
                    "frame_properties": {"timestamp": timestamp},
                    "objects": objects,
                }
            },
        }
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--score-threshold", type=float, default=0.1)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cmtcoop_tpu.configs.presets import get_preset
    from cmtcoop_tpu.core.coder import decode_boxes
    from cmtcoop_tpu.data import formats
    from cmtcoop_tpu.data.loader import build_test_loader
    from cmtcoop_tpu.data.pipelines.box_np import points_in_rbbox
    from cmtcoop_tpu.models.build import build_detector

    preset = get_preset(args.preset)
    dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[args.dtype]
    model = build_detector(preset, train=False, dtype=dtype)
    ds, _ = build_test_loader(preset, args.data_root, split=args.split)
    os.makedirs(args.out_dir, exist_ok=True)

    variables = None

    @jax.jit
    def forward(variables, batch):
        (task_outs, _), _ = model.apply(
            variables, batch, mutable=["batch_stats"])
        logits = [t["cls_logits"][-1] for t in task_outs]
        codes = [jnp.concatenate(
            [t["center"][-1], t["height"][-1], t["dim"][-1], t["rot"][-1],
             t["vel"][-1]], axis=-1) for t in task_outs]
        return logits, codes

    for i in range(len(ds)):
        batch = formats.collate([ds[i]])
        if variables is None:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
            if args.checkpoint:
                from cmtcoop_tpu.train.checkpoint import restore_checkpoint
                restored = restore_checkpoint(args.checkpoint, None)
                variables = dict(variables)
                variables["params"] = (
                    restored["params"] if isinstance(restored, dict)
                    else restored.params)
        logits, codes = forward(variables, batch)
        dec = decode_boxes(
            [l[0] for l in logits], [c[0] for c in codes],
            score_threshold=args.score_threshold)
        valid = np.asarray(dec.valid)
        boxes = np.asarray(dec.boxes)[valid]
        scores = np.asarray(dec.scores)[valid]
        labels = np.asarray(dec.labels)[valid]
        # per-box point count on the (registered) cloud
        info = ds.infos[i]
        pts_path = info.get("registered_lidar_path",
                            info.get("lidar_path"))
        npts = None
        if pts_path and os.path.exists(pts_path):
            pts = np.fromfile(pts_path, np.float32).reshape(-1, 5)
            npts = points_in_rbbox(pts, boxes).sum(0) if len(boxes) else []
        ts = info["timestamp"]
        ol = boxes_to_openlabel(
            boxes, scores, labels, preset.class_names, ts, npts)
        with open(os.path.join(
                args.out_dir, f"{ts}_registered.json"), "w") as f:
            json.dump(ol, f, indent=1)
    print(f"wrote {len(ds)} OpenLabel frames to {args.out_dir}")


if __name__ == "__main__":
    main()
