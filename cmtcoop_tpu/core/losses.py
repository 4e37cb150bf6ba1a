"""Detection losses with mmdet-compatible semantics, in pure jnp.

The reference uses mmdet's `FocalLoss(use_sigmoid=True, gamma=2, alpha=0.25,
loss_weight=2.0)` and `L1Loss(loss_weight=0.25)` (coop config:325-327), both
reduced as sum/avg_factor. The focal CUDA kernel in mmcv is replaced by the
algebraically identical elementwise form, which XLA fuses on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_weights: jnp.ndarray,
    num_classes: int,
    avg_factor,
    gamma: float = 2.0,
    alpha: float = 0.25,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """mmdet-style sigmoid focal loss.

    `labels == num_classes` means background (all-zero one-hot row), matching
    mmdet's FocalLoss one-hot convention.

    Args:
        logits: (N, num_classes)
        labels: (N,) int in [0, num_classes]
        label_weights: (N,) per-sample weight (0 for padded rows)
        avg_factor: scalar normalizer (pos + 0.1*neg in the reference,
            cmt_head.py:700-704).
    """
    labels = labels.astype(jnp.int32)
    target = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_weight = (alpha * target + (1.0 - alpha) * (1.0 - target)) * (
        pt ** gamma)
    bce = optax_sigmoid_bce(logits, target)
    loss = bce * focal_weight * label_weights[..., None]
    return loss_weight * jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def optax_sigmoid_bce(logits, target):
    """Numerically stable binary cross entropy with logits."""
    return jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def weighted_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weights: jnp.ndarray,
    avg_factor,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """mmdet L1Loss with per-element weights and sum/avg_factor reduction
    (cmt_head.py:710-716)."""
    loss = jnp.abs(pred - target) * weights
    return loss_weight * jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def focal_cost(
    logits: jnp.ndarray,
    gt_labels: jnp.ndarray,
    weight: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """mmdet FocalLossCost: pairwise (num_query, num_gt) classification cost.

    cost[q, g] = pos_cost(q, label_g) - neg_cost(q, label_g), the reference's
    cls_cost with weight 2.0 (coop config:337).
    """
    p = jax.nn.sigmoid(jnp.asarray(logits, jnp.float32))
    neg = -jnp.log(1.0 - p + eps) * (1.0 - alpha) * (p ** gamma)
    pos = -jnp.log(p + eps) * alpha * ((1.0 - p) ** gamma)
    cls_cost = pos[:, gt_labels] - neg[:, gt_labels]
    return cls_cost * weight


def l1_cost(pred: jnp.ndarray, gt: jnp.ndarray, weight: float = 0.25):
    """mmdet BBox3DL1Cost: pairwise L1 distance (torch.cdist p=1)
    (core/bbox/match_costs/match_cost.py:5-24)."""
    d = jnp.sum(jnp.abs(pred[:, None, :] - gt[None, :, :]), axis=-1)
    return d * weight
