"""Validation-during-training: the mmcv EvalHook equivalent.

The reference registers a CustomDistEvalHook that runs the full val split
through the model every `interval` epochs and logs the nusc-protocol metric
dict (coop config:389-399; key names a9coop_dataset.py:1000-1016 —
`object/map`, `object/nds`, per-class APs). Here the same loop is a plain
function over the eval-mode model: the train step keeps its own jitted
graph, and the hook jits a separate eval forward once, reusing it across
invocations (static shapes -> one compile).

`run_eval` is also the body of tools/test.py, so the mid-training eval and
the offline eval CLI are the same code path.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

log = logging.getLogger("cmtcoop")


def make_eval_forward(model):
    """Jitted eval forward -> (last-layer logits, last-layer codes)."""
    @jax.jit
    def forward(variables, batch):
        (task_outs, _), _ = model.apply(
            variables, batch, mutable=["batch_stats"])
        logits = [t["cls_logits"][-1] for t in task_outs]
        codes = [jnp.concatenate(
            [t["center"][-1], t["height"][-1], t["dim"][-1], t["rot"][-1],
             t["vel"][-1]], axis=-1) for t in task_outs]
        return logits, codes
    return forward


def run_eval(model, variables, ds, preset, batch_size: int = 1,
             max_samples: Optional[int] = None, work_dir: Optional[str] = None,
             forward=None, collect_preds: bool = True):
    """Run the val split through `model`, score with the nusc protocol.

    The tail batch is padded by repeating the last sample so one compiled
    shape serves every batch (reference iterates b=1,
    tools/test.py:200-214). Returns (summary, preds).
    """
    from cmtcoop_tpu.core.coder import decode_boxes
    from cmtcoop_tpu.data import formats

    if forward is None:
        forward = make_eval_forward(model)
    preds = {}
    bs = max(1, batch_size)
    total = len(ds)
    if max_samples:
        total = min(total, max_samples)
    for start in range(0, total, bs):
        idxs = list(range(start, min(start + bs, total)))
        padded = idxs + [idxs[-1]] * (bs - len(idxs))
        batch = formats.collate([ds[i] for i in padded])
        logits, codes = forward(variables, batch)
        for b, i in enumerate(idxs):
            dec = decode_boxes([l[b] for l in logits],
                               [c[b] for c in codes])
            ts = ds.infos[i]["timestamp"]
            preds[ts] = formats.decoded_to_eval_boxes(
                dec, preset.class_names, ts)
    summary = ds.evaluate(preds, output_dir=work_dir)
    return summary, preds


def make_eval_hook(preset, data_root: str, split: str = "val",
                   dtype=jnp.float32, batch_size: int = 1,
                   max_samples: Optional[int] = None
                   ) -> Callable[[Any, int], Dict[str, float]]:
    """Build a Trainer-compatible `eval_hook(state, step) -> metric dict`.

    Builds a SEPARATE eval-mode model (no DN queries, no dropout, cf conv
    path) over the same parameter tree; the jitted forward and the dataset
    are cached across invocations.
    """
    from cmtcoop_tpu.data.loader import build_test_loader
    from cmtcoop_tpu.models.build import build_detector
    from cmtcoop_tpu.models.pillar_encoder import prepare_variables

    eval_model = build_detector(preset, train=False, dtype=dtype)
    ds, _ = build_test_loader(preset, data_root, split=split)
    forward = make_eval_forward(eval_model)

    def hook(state, step: int) -> Dict[str, float]:
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        variables = prepare_variables(eval_model, variables)
        summary, _ = run_eval(
            eval_model, variables, ds, preset, batch_size=batch_size,
            max_samples=max_samples, forward=forward)
        out = {"object/map": float(summary["mean_ap"]),
               "object/nds": float(summary["nd_score"])}
        out.update({k: float(v) for k, v in summary["detail"].items()
                    if isinstance(v, (int, float))})
        return out

    return hook
