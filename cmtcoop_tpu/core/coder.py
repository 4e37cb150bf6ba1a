"""NMS-free multi-task box decoding (static-shape, jit-friendly).

TPU-native rebuild of the reference MultiTaskBBoxCoder
(core/bbox/coders/multi_task_bbox_coder.py:15-142): sigmoid all class logits,
take a flat top-`max_num` over (query x class), map each winner back to its
(task, query, label), denormalize the matching 10-dim code and filter by the
post-center range. Instead of variable-length outputs we always return
`max_num` slots plus a validity mask so the whole decode stays inside jit.
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from cmtcoop_tpu.core.boxes import denormalize_bbox, gravity_to_bottom_center


class DecodedBoxes(NamedTuple):
    boxes: jnp.ndarray   # (max_num, 9)  bottom-centered box9
    scores: jnp.ndarray  # (max_num,)
    labels: jnp.ndarray  # (max_num,) global class ids
    valid: jnp.ndarray   # (max_num,) bool


def decode_boxes(
    task_logits: Sequence[jnp.ndarray],
    task_codes: Sequence[jnp.ndarray],
    max_num: int = 300,
    post_center_range: Sequence[float] = (-80.0, -80.0, -10.0, 80.0, 80.0, 10.0),
    score_threshold: float | None = None,
) -> DecodedBoxes:
    """Decode one sample's final-layer predictions into top boxes.

    Args:
        task_logits: per task, (num_query, C_t) classification logits.
        task_codes: per task, (num_query, 10) normalized box codes in the order
            (center2, height1, dim3, rot2, vel2) as emitted by the task heads
            (coder:120-126).
        max_num: flat top-k size (reference max_num=300, coop config:289).
    Returns:
        DecodedBoxes with z shifted to the box bottom, matching
        `get_bboxes` (cmt_head.py:905-919).
    """
    num_query = task_logits[0].shape[0]
    all_logits = jnp.concatenate(task_logits, axis=-1)       # (nq, sumC)
    all_codes = jnp.concatenate(task_codes, axis=0)          # (T*nq, 10)
    # class -> task lookup, matching coder.py:131-134 task_ids tensor
    class_task: List[int] = []
    for t, lg in enumerate(task_logits):
        class_task.extend([t] * lg.shape[-1])
    class_task_arr = jnp.asarray(class_task, dtype=jnp.int32)
    total_classes = all_logits.shape[-1]

    scores_flat = jnp.reshape(
        jax.nn.sigmoid(jnp.asarray(all_logits, jnp.float32)), (-1,))
    # tiny heads can have fewer than max_num (query, class) candidates
    top_scores, top_idx = jax.lax.top_k(
        scores_flat, min(max_num, scores_flat.shape[0]))
    labels = top_idx % total_classes
    query_idx = top_idx // total_classes
    task_idx = class_task_arr[labels]
    codes = all_codes[task_idx * num_query + query_idx]

    boxes = denormalize_bbox(codes)
    lo = jnp.asarray(post_center_range[:3], boxes.dtype)
    hi = jnp.asarray(post_center_range[3:], boxes.dtype)
    valid = jnp.all(boxes[..., :3] >= lo, axis=-1) & jnp.all(
        boxes[..., :3] <= hi, axis=-1)
    if score_threshold is not None:
        valid &= top_scores > score_threshold
    boxes = gravity_to_bottom_center(boxes)
    return DecodedBoxes(boxes, top_scores, labels.astype(jnp.int32), valid)
