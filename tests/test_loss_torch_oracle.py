"""Torch-oracle parity for the CMT training loss (VERDICT r4 missing #2).

The existing parity chain (`test_full_model_parity.py`) stops at decoded
boxes; this file extends it through the LOSS: an independent torch+scipy
re-implementation of the reference's loss math —

  - assigner cost assembly (hungarian_assigner_3d.py:123-147): FocalLossCost
    (weight 2.0) + code-weighted BBox3DL1Cost (weight 0.25) over code[:8],
    scipy linear_sum_assignment
  - `loss_single` / `_loss_single_task` (cmt_head.py:666-757): per-task
    targets, mmdet sigmoid focal loss with cls_avg = pos + 0.1*neg
    (loss_weight 2.0), code-weighted L1 with avg = num_pos (loss_weight 0.25)
  - `dn_loss_single` / `_dn_loss_single_task` (cmt_head.py:759-823): DN slot
    gather at (bid, group*single_pad + i), cls_avg = num_tgt*pi/6*split^3,
    bbox avg = clamp(mean(num_tgt), 1), task filter via known_labels_raw

— evaluated on random preds/GT and compared against `cmt_loss` per layer and
per key to <=1e-5 relative. Random continuous costs make LAP ties
measure-zero, so assignments must agree exactly.

Flagship configuration: ONE task of 7 classes (coop config:280-282), which is
what every TUMTraf CMT config uses.
"""
import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from scipy.optimize import linear_sum_assignment  # noqa: E402

from cmtcoop_tpu.models.cmt_head import DNInfo  # noqa: E402
from cmtcoop_tpu.models.cmt_loss import (  # noqa: E402
    DEFAULT_CODE_WEIGHTS, cmt_loss)

N_CLS = 7
CW = torch.tensor(DEFAULT_CODE_WEIGHTS, dtype=torch.float64)


# ------------------------------------------------------------- torch oracle


def t_normalize_bbox(b):
    """Reference core/bbox/util.py:8-35."""
    return torch.cat(
        [b[..., 0:3], b[..., 3:6].log(), b[..., 6:7].sin(),
         b[..., 6:7].cos(), b[..., 7:9]], dim=-1)


def t_focal_cost(logits, gt_labels, weight=2.0, alpha=0.25, gamma=2.0,
                 eps=1e-12):
    """mmdet FocalLossCost (match_cost.py)."""
    p = logits.sigmoid()
    neg = -(1 - p + eps).log() * (1 - alpha) * p.pow(gamma)
    pos = -(p + eps).log() * alpha * (1 - p).pow(gamma)
    return (pos[:, gt_labels] - neg[:, gt_labels]) * weight


def t_focal_loss(logits, labels, label_weights, avg_factor, gamma=2.0,
                 alpha=0.25, loss_weight=2.0):
    """mmdet FocalLoss(use_sigmoid) with index targets; label == C is
    background (all-zero one-hot row)."""
    c = logits.shape[-1]
    target = F.one_hot(labels.long(), c + 1)[..., :c].to(logits.dtype)
    p = logits.sigmoid()
    pt = (1 - p) * target + p * (1 - target)
    fw = (alpha * target + (1 - alpha) * (1 - target)) * pt.pow(gamma)
    loss = F.binary_cross_entropy_with_logits(
        logits, target, reduction="none") * fw
    loss = loss * label_weights[..., None]
    return loss_weight * loss.sum() / max(avg_factor, 1.0)


def t_l1_loss(pred, target, weights, avg_factor, loss_weight=0.25):
    return loss_weight * ((pred - target).abs() * weights).sum() / max(
        avg_factor, 1.0)


def oracle_loss_single(pred_bboxes, pred_logits, gt_list, label_list):
    """Reference loss_single for one decoder layer, single task.

    pred_bboxes: (B, nq, 10) torch; pred_logits: (B, nq, C);
    gt_list: per-sample (g_b, 9); label_list: per-sample (g_b,).
    Returns (loss_cls, loss_bbox).
    """
    b, nq, _ = pred_bboxes.shape
    labels = torch.full((b, nq), N_CLS, dtype=torch.long)
    bbox_targets = torch.zeros(b, nq, 10, dtype=pred_bboxes.dtype)
    bbox_weights = torch.zeros(b, nq, 10, dtype=pred_bboxes.dtype)
    num_pos = 0
    for i in range(b):
        gt, lab = gt_list[i], label_list[i]
        if gt.shape[0] == 0:
            continue
        ngt = t_normalize_bbox(gt)
        cw = CW.to(pred_bboxes.dtype)
        bp = pred_bboxes[i] * cw
        ng = ngt * cw
        cost = t_focal_cost(pred_logits[i], lab) + 0.25 * torch.cdist(
            bp[:, :8], ng[:, :8], p=1)
        row, col = linear_sum_assignment(cost.numpy())
        row, col = torch.from_numpy(row), torch.from_numpy(col)
        labels[i, row] = lab[col]
        bbox_targets[i, row] = ngt[col]
        bbox_weights[i, row] = 1.0
        num_pos += len(row)
    num_neg = b * nq - num_pos
    cls_avg = num_pos + 0.1 * num_neg
    loss_cls = t_focal_loss(
        pred_logits.reshape(-1, N_CLS), labels.reshape(-1),
        torch.ones(b * nq, dtype=pred_logits.dtype), cls_avg)
    bw = bbox_weights * CW.to(pred_bboxes.dtype)
    loss_bbox = t_l1_loss(pred_bboxes, bbox_targets, bw, num_pos)
    return loss_cls, loss_bbox


def oracle_dn_loss_single(dn_bboxes, dn_logits, known, split=0.75,
                          dn_weight=1.0):
    """Reference dn_loss_single for one layer, single task.

    dn_bboxes: (B, pad, 10); dn_logits: (B, pad, C); `known` is a list of
    (bid, slot, label_noised, label_raw, box9) tuples — the dynamic known
    set, slot = group*single_pad + i (cmt_head.py:381-384).
    """
    bid = torch.tensor([k[0] for k in known])
    slot = torch.tensor([k[1] for k in known])
    kl = torch.tensor([k[2] for k in known])
    raw = torch.tensor([k[3] for k in known])
    boxes = torch.stack([k[4] for k in known])
    num_tgt = len(known)
    pl = dn_logits[(bid, slot)]
    pb = dn_bboxes[(bid, slot)]
    task_mask = raw != N_CLS
    pb = pb[task_mask]
    kb = boxes[task_mask]
    cls_avg = max(num_tgt * math.pi / 6 * split ** 3, 1.0)
    loss_cls = t_focal_loss(
        pl, kl, torch.ones(num_tgt, dtype=pl.dtype), cls_avg)
    nb = t_normalize_bbox(kb)
    bw = torch.ones_like(pb) * CW.to(pb.dtype)
    loss_bbox = t_l1_loss(pb, nb, bw, max(float(num_tgt), 1.0))
    return dn_weight * loss_cls, dn_weight * loss_bbox


# ------------------------------------------------------------------- fixture


def _random_gt(rng, counts, max_gt):
    """Padded (B, max_gt, 9) GT + labels + mask and the per-sample lists."""
    b = len(counts)
    gt = np.zeros((b, max_gt, 9), np.float64)
    labels = np.zeros((b, max_gt), np.int64)
    mask = np.zeros((b, max_gt), bool)
    gt_list, label_list = [], []
    for i, n in enumerate(counts):
        g = np.concatenate([
            rng.uniform(-60, 60, (n, 2)),      # cx, cy
            rng.uniform(-6, 0, (n, 1)),        # cz (gravity center)
            rng.uniform(0.5, 4.0, (n, 3)),     # dims
            rng.uniform(-np.pi, np.pi, (n, 1)),
            rng.normal(0, 2, (n, 2)),          # vel
        ], axis=1)
        lab = rng.integers(0, N_CLS, n)
        gt[i, :n] = g
        labels[i, :n] = lab
        mask[i, :n] = True
        gt_list.append(torch.from_numpy(g))
        label_list.append(torch.from_numpy(lab))
    return gt, labels, mask, gt_list, label_list


def _random_outs(rng, layers, b, nq):
    """Head-output dict in the head's post-forward space (center/height
    metric, dim log-space, rot raw (sin, cos) regressors)."""
    return {
        "center": rng.uniform(-60, 60, (layers, b, nq, 2)),
        "height": rng.uniform(-7, -1, (layers, b, nq, 1)),
        "dim": rng.normal(0.3, 0.6, (layers, b, nq, 3)),
        "rot": rng.normal(0, 1, (layers, b, nq, 2)),
        "vel": rng.normal(0, 1, (layers, b, nq, 2)),
        "cls_logits": rng.normal(-2, 2, (layers, b, nq, N_CLS)),
    }


def _pred_code_t(outs, layer):
    return torch.from_numpy(np.concatenate(
        [outs["center"][layer], outs["height"][layer], outs["dim"][layer],
         outs["rot"][layer], outs["vel"][layer]], axis=-1))


def test_loss_torch_oracle():
    rng = np.random.default_rng(7)
    layers, b, nq, max_gt, groups = 2, 2, 64, 6, 3
    counts = (6, 4)
    split = 0.75

    gt, labels, mask, gt_list, label_list = _random_gt(rng, counts, max_gt)
    outs = _random_outs(rng, layers, b, nq)

    # ---- DN state, built exactly like prepare_for_dn (noise_scale 1.0)
    pad = groups * max_gt
    rand = rng.uniform(-1.0, 1.0, (b, groups, max_gt, 3))
    over = np.linalg.norm(rand, axis=-1) > split
    known_labels = np.where(over, N_CLS, labels[:, None, :]).astype(np.int64)
    known_raw = np.broadcast_to(
        labels[:, None, :], (b, groups, max_gt)).copy()
    known_boxes = np.broadcast_to(
        gt[:, None], (b, groups, max_gt, 9)).copy()
    valid = np.broadcast_to(mask[:, None, :], (b, groups, max_gt)).copy()
    dn_outs = {
        "dn_" + k: v for k, v in _random_outs(rng, layers, b, pad).items()}
    dn_info = DNInfo(
        known_labels=jnp.asarray(known_labels),
        known_labels_raw=jnp.asarray(known_raw),
        known_boxes=jnp.asarray(known_boxes.astype(np.float32)),
        valid=jnp.asarray(valid), pad_size=pad)

    task_outs = [{
        **{k: jnp.asarray(v.astype(np.float32)) for k, v in outs.items()},
        **{k: jnp.asarray(v.astype(np.float32)) for k, v in dn_outs.items()},
    }]
    ours = cmt_loss(
        task_outs, dn_info, jnp.asarray(gt.astype(np.float32)),
        jnp.asarray(labels), jnp.asarray(mask),
        tasks=(tuple(f"C{i}" for i in range(N_CLS)),), split=split)
    ours = {k: float(v) for k, v in ours.items()}

    # ---- oracle, float64 end to end
    # known set in reference order: group-major, batch-major inside a group
    known = []
    for g in range(groups):
        for i in range(b):
            for j in range(counts[i]):
                known.append((
                    i, g * max_gt + j, int(known_labels[i, g, j]),
                    int(known_raw[i, g, j]), torch.from_numpy(gt[i, j])))

    for layer in range(layers):
        tag = "" if layer == layers - 1 else f"d{layer}."
        lc, lb = oracle_loss_single(
            _pred_code_t(outs, layer),
            torch.from_numpy(outs["cls_logits"][layer]),
            gt_list, label_list)
        np.testing.assert_allclose(
            ours[f"{tag}loss_cls"], float(lc), rtol=1e-5)
        np.testing.assert_allclose(
            ours[f"{tag}loss_bbox"], float(lb), rtol=1e-5)
        dn_pb = torch.from_numpy(np.concatenate(
            [dn_outs["dn_center"][layer], dn_outs["dn_height"][layer],
             dn_outs["dn_dim"][layer], dn_outs["dn_rot"][layer],
             dn_outs["dn_vel"][layer]], axis=-1))
        dc, db = oracle_dn_loss_single(
            dn_pb, torch.from_numpy(dn_outs["dn_cls_logits"][layer]),
            known, split=split)
        np.testing.assert_allclose(
            ours[f"{tag}dn_loss_cls"], float(dc), rtol=1e-5)
        np.testing.assert_allclose(
            ours[f"{tag}dn_loss_bbox"], float(db), rtol=1e-5)

    # the summed scalar the train step optimizes
    total = sum(v for k, v in ours.items() if k != "loss")
    np.testing.assert_allclose(ours["loss"], total, rtol=1e-6)


def test_loss_oracle_no_gt_sample():
    """A sample with ZERO GT must still produce finite, oracle-matching
    losses (reference assign short-circuits to all-background,
    hungarian_assigner_3d.py:115-121)."""
    rng = np.random.default_rng(11)
    layers, b, nq, max_gt = 1, 2, 32, 4
    gt, labels, mask, gt_list, label_list = _random_gt(rng, (3, 0), max_gt)
    outs = _random_outs(rng, layers, b, nq)
    task_outs = [{k: jnp.asarray(v.astype(np.float32))
                  for k, v in outs.items()}]
    ours = cmt_loss(
        task_outs, None, jnp.asarray(gt.astype(np.float32)),
        jnp.asarray(labels), jnp.asarray(mask),
        tasks=(tuple(f"C{i}" for i in range(N_CLS)),))
    lc, lb = oracle_loss_single(
        _pred_code_t(outs, 0), torch.from_numpy(outs["cls_logits"][0]),
        gt_list, label_list)
    np.testing.assert_allclose(float(ours["loss_cls"]), float(lc), rtol=1e-5)
    np.testing.assert_allclose(
        float(ours["loss_bbox"]), float(lb), rtol=1e-5)
