#!/usr/bin/env python
"""Evaluation CLI (reference tools/test.py:130-286 equivalent).

    python tools/test.py cmt_fusion_coop_tumtraf CKPT_DIR \
        --data-root data/a9_coop --split val --eval bbox
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("checkpoint", nargs="?", default=None,
                    help="orbax checkpoint dir (optional: random init)")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--eval", default="bbox")
    ap.add_argument("--out", default=None, help="write detections json")
    ap.add_argument("--work-dir", default=None,
                    help="write results_nusc.json + metrics_summary.json + "
                         "metrics_details.json here (reference eval "
                         "artifacts, a9coop_dataset.py:293-337, 918-940)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch-size", type=int, default=1,
                    help="eval batch size (tail batch is padded by "
                         "repeating the last sample; one compiled shape)")
    ap.add_argument("--max-samples", type=int, default=None)
    ap.add_argument("--cfg-options", nargs="*", default=None,
                    help="preset field overrides, key=value")
    return ap.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    import jax
    if os.environ.get("CMTCOOP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CMTCOOP_PLATFORM"])
    import jax.numpy as jnp
    from cmtcoop_tpu.configs.presets import get_preset
    from cmtcoop_tpu.data.loader import build_test_loader
    from cmtcoop_tpu.models.build import build_detector

    preset = get_preset(args.preset)
    if getattr(args, "cfg_options", None):
        from cmtcoop_tpu.utils.config import apply_overrides
        preset = apply_overrides(preset, args.cfg_options)
    dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[args.dtype]
    model = build_detector(preset, train=False, dtype=dtype)
    ds, loader = build_test_loader(
        preset, args.data_root, split=args.split)

    example = None
    for example in loader:
        break
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example)
    if args.checkpoint:
        from cmtcoop_tpu.train.checkpoint import restore_checkpoint
        restored = restore_checkpoint(args.checkpoint, None)
        params = restored.get("params", restored) if isinstance(
            restored, dict) else restored.params
        variables = dict(variables)
        variables["params"] = params
    # hoist frame-invariant pillar band matrices (AFTER weight loading —
    # prepared values are derived from params/batch_stats)
    from cmtcoop_tpu.models.pillar_encoder import prepare_variables
    variables = prepare_variables(model, variables)

    # shared with the mid-training EvalHook (train/eval_hook.py)
    from cmtcoop_tpu.train.eval_hook import run_eval
    summary, preds = run_eval(
        model, variables, ds, preset, batch_size=args.batch_size,
        max_samples=args.max_samples,
        work_dir=args.work_dir if "bbox" in args.eval else None)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({str(k): v for k, v in preds.items()}, f)
    if args.work_dir:
        from cmtcoop_tpu.data.eval.nusc_protocol import write_results_nusc
        write_results_nusc(
            preds, args.work_dir,
            meta={"use_lidar": preset.use_lidar,
                  "use_camera": preset.use_camera})
    if "bbox" in args.eval:
        print(json.dumps(summary["detail"], indent=2))
        print(f"mAP: {summary['mean_ap']:.4f}  NDS: "
              f"{summary['nd_score']:.4f}")


if __name__ == "__main__":
    main()
