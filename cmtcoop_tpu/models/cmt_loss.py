"""CMT training loss: Hungarian matching targets + focal/L1 + DN loss.

Rebuild of reference cmt_head.py:556-903 with static shapes and the on-device
LAP solver instead of scipy-on-CPU (hungarian_assigner_3d.py:138-147):

- per (decoder layer x task): code-weighted focal+L1 cost over the padded GT
  set, exact LAP, scatter into per-query targets, focal cls loss with
  avg = pos + 0.1*neg and weighted L1 with avg = pos.
- DN loss (cmt_head.py:759-823): per-task relabeling (out-of-task ->
  background), bbox rows filtered to the task, cls_avg = num_tgt*pi/6*split^3,
  bbox avg = cross-replica mean of num_tgt.

All reductions support an optional `axis_name` for pmean/psum inside
shard_map (the reference's `reduce_mean` DDP all-reduce, cmt_head.py:795).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from cmtcoop_tpu.core.boxes import normalize_bbox
from cmtcoop_tpu.core.hungarian import solve_lap
from cmtcoop_tpu.core.losses import (focal_cost, l1_cost, sigmoid_focal_loss,
                                     weighted_l1_loss)

DEFAULT_CODE_WEIGHTS = (2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2)


def _safe_normalize(gt_boxes, gt_mask):
    """normalize_bbox with padded rows replaced by a finite dummy (the
    reference's isnotnan filter, cmt_head.py:705-716)."""
    dummy = jnp.ones_like(gt_boxes)
    safe = jnp.where(gt_mask[..., None], gt_boxes, dummy)
    return normalize_bbox(safe)


def assign_one_sample(pred_code, pred_logits, gt_code, gt_labels_local,
                      gt_mask, cls_weight, reg_weight, code_weights):
    """Hungarian assignment for one (sample, task).

    Args:
        pred_code: (nq, 10) normalized prediction.
        pred_logits: (nq, C_t).
        gt_code: (G, 10) normalized GT.
        gt_labels_local: (G,) task-local labels.
        gt_mask: (G,) validity.
    Returns:
        col4row: (G,) matched query per GT row.
    """
    cw = jnp.asarray(code_weights, pred_code.dtype)
    cost_cls = focal_cost(pred_logits, gt_labels_local, weight=cls_weight)
    cost_reg = l1_cost(
        (pred_code * cw)[:, :8], (gt_code * cw)[:, :8], weight=reg_weight)
    cost = cost_cls + cost_reg  # (nq, G)
    return solve_lap(cost.T, gt_mask)


def task_targets(pred_code, pred_logits, gt_boxes, gt_labels, gt_mask,
                 task_id, task_classes: Sequence[str], class_offset: int,
                 code_weights=DEFAULT_CODE_WEIGHTS,
                 cls_cost_weight: float = 2.0, reg_cost_weight: float = 0.25):
    """Batched target assembly for one task.

    Args:
        pred_code: (B, nq, 10); pred_logits: (B, nq, C_t).
        gt_boxes: (B, G, 9) gravity-centered; gt_labels: (B, G) global ids.
    Returns:
        labels (B, nq) in [0, C_t], label_weights (B, nq),
        bbox_targets (B, nq, 10) normalized, bbox_weights (B, nq, 10),
        num_pos (scalar).
    """
    b, nq, _ = pred_code.shape
    n_cls = len(task_classes)
    in_task = (gt_labels >= class_offset) & (
        gt_labels < class_offset + n_cls) & gt_mask
    local = jnp.clip(gt_labels - class_offset, 0, n_cls - 1)
    gt_code = _safe_normalize(gt_boxes, in_task)

    col4row = jax.vmap(
        lambda pc, pl, gc, gl, gm: assign_one_sample(
            pc, pl, gc, gl, gm, cls_cost_weight, reg_cost_weight,
            code_weights)
    )(pred_code, pred_logits, gt_code, local, in_task)

    g = gt_labels.shape[1]
    scatter_q = jnp.where(in_task, col4row, nq)  # drop invalid
    labels = jnp.full((b, nq), n_cls, jnp.int32)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, g))
    labels = labels.at[bidx, scatter_q].set(
        local.astype(jnp.int32), mode="drop")
    bbox_targets = jnp.zeros((b, nq, 10), pred_code.dtype)
    bbox_targets = bbox_targets.at[bidx, scatter_q].set(
        gt_code.astype(pred_code.dtype), mode="drop")
    bbox_weights = jnp.zeros((b, nq, 10), pred_code.dtype)
    bbox_weights = bbox_weights.at[bidx, scatter_q].set(
        jnp.ones((b, g, 10), pred_code.dtype), mode="drop")
    label_weights = jnp.ones((b, nq), pred_code.dtype)
    num_pos = jnp.sum(in_task)
    return labels, label_weights, bbox_targets, bbox_weights, num_pos


def _cat_code(outs, prefix=""):
    """(L, B, nq, 10) normalized code from head outputs in the canonical
    (center, height, dim, rot, vel) order (cmt_head.py:832-838)."""
    return jnp.concatenate(
        [outs[prefix + "center"], outs[prefix + "height"],
         outs[prefix + "dim"], outs[prefix + "rot"], outs[prefix + "vel"]],
        axis=-1)


def cmt_loss(
    task_outs,
    dn_info,
    gt_boxes, gt_labels, gt_mask,
    tasks: Tuple[Tuple[str, ...], ...],
    code_weights=DEFAULT_CODE_WEIGHTS,
    cls_loss_weight: float = 2.0,
    bbox_loss_weight: float = 0.25,
    dn_weight: float = 1.0,
    split: float = 0.75,
    axis_name: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Full loss dict keyed like the reference logger output
    (`d{i}.loss_cls/bbox`, `loss_cls/bbox`, `dn_*`)."""
    losses: Dict[str, jnp.ndarray] = {}
    num_layers = task_outs[0]["center"].shape[0]
    cw = jnp.asarray(code_weights, jnp.float32)

    for layer in range(num_layers):
        l_cls = 0.0
        l_bbox = 0.0
        for t, names in enumerate(tasks):
            offset = sum(len(x) for x in tasks[:t])
            outs = task_outs[t]
            pred_code = _cat_code(outs)[layer].astype(jnp.float32)
            pred_logits = outs["cls_logits"][layer].astype(jnp.float32)
            (labels, label_w, bbox_t, bbox_w, num_pos) = task_targets(
                pred_code, pred_logits, gt_boxes, gt_labels, gt_mask, t,
                names, offset, code_weights)
            num_neg = labels.size - num_pos
            cls_avg = num_pos.astype(jnp.float32) + 0.1 * num_neg
            l_cls += sigmoid_focal_loss(
                pred_logits.reshape(-1, len(names)), labels.reshape(-1),
                label_w.reshape(-1), len(names), cls_avg,
                loss_weight=cls_loss_weight)
            bw = bbox_w * cw[None, None, :]
            l_bbox += weighted_l1_loss(
                pred_code, bbox_t, bw, num_pos.astype(jnp.float32),
                loss_weight=bbox_loss_weight)
        tag = "" if layer == num_layers - 1 else f"d{layer}."
        losses[f"{tag}loss_cls"] = jnp.nan_to_num(l_cls)
        losses[f"{tag}loss_bbox"] = jnp.nan_to_num(l_bbox)

    if dn_info is not None:
        _dn_losses(losses, task_outs, dn_info, tasks, code_weights,
                   cls_loss_weight, bbox_loss_weight, dn_weight, split,
                   axis_name)

    losses["loss"] = sum(
        v for k, v in losses.items() if k != "loss")
    return losses


def _dn_losses(losses, task_outs, dn_info, tasks, code_weights,
               cls_loss_weight, bbox_loss_weight, dn_weight, split,
               axis_name):
    num_layers = task_outs[0]["center"].shape[0]
    cw = jnp.asarray(code_weights, jnp.float32)
    b, groups, g = dn_info.valid.shape
    valid = dn_info.valid.reshape(b, -1)                       # (B, pad)
    num_tgt = jnp.sum(valid).astype(jnp.float32)
    # cross-replica mean for the bbox normalizer (reference reduce_mean,
    # cmt_head.py:793-796)
    num_tgt_mean = num_tgt
    if axis_name is not None:
        num_tgt_mean = jax.lax.pmean(num_tgt, axis_name)
    num_tgt_mean = jnp.maximum(num_tgt_mean, 1.0)
    gt_code = _safe_normalize(
        dn_info.known_boxes.reshape(b, -1, 9), valid)          # (B, pad, 10)

    for layer in range(num_layers):
        l_cls = 0.0
        l_bbox = 0.0
        for t, names in enumerate(tasks):
            offset = sum(len(x) for x in tasks[:t])
            n_cls = len(names)
            outs = task_outs[t]
            pred_code = _cat_code(outs, "dn_")[layer].astype(jnp.float32)
            pred_logits = outs["dn_cls_logits"][layer].astype(jnp.float32)

            kl = dn_info.known_labels.reshape(b, -1)
            in_task_noised = (kl >= offset) & (kl < offset + n_cls)
            labels_t = jnp.where(in_task_noised, kl - offset, n_cls)
            raw = dn_info.known_labels_raw.reshape(b, -1)
            in_task_raw = (raw >= offset) & (raw < offset + n_cls) & valid

            cls_avg = num_tgt * math.pi / 6.0 * split ** 3
            cls_avg = jnp.maximum(cls_avg, 1.0)
            l_cls += sigmoid_focal_loss(
                pred_logits.reshape(-1, n_cls), labels_t.reshape(-1),
                valid.reshape(-1).astype(jnp.float32), n_cls, cls_avg,
                loss_weight=cls_loss_weight)

            bw = in_task_raw[..., None] * cw[None, None, :]
            l_bbox += weighted_l1_loss(
                pred_code, gt_code, bw, num_tgt_mean,
                loss_weight=bbox_loss_weight)
        tag = "" if layer == num_layers - 1 else f"d{layer}."
        losses[f"{tag}dn_loss_cls"] = jnp.nan_to_num(dn_weight * l_cls)
        losses[f"{tag}dn_loss_bbox"] = jnp.nan_to_num(dn_weight * l_bbox)
