"""Optimizer: AdamW with per-module LR groups, cyclic LR/momentum, clip-35.

Reference recipe (coop config:362-388):
  AdamW lr 1e-4 wd 0.01; custom_keys {img_backbone: lr_mult 0.01 decay_mult 5,
  img_neck: lr_mult 0.1}; grad_clip max_norm 35 (L2);
  lr_config cyclic: target_ratio (2, 1e-4), cyclic_times 1, step_ratio_up 0.4;
  momentum_config cyclic: target_ratio (0.85/0.95, 1) -> beta1 dips mid-run.

mmcv's CyclicLrUpdater anneals cosine between phase endpoints
(annealing_cos(start, end, pct) = end + (start-end)/2*(cos(pi*pct)+1)); we
reproduce that exactly, per-step (by_epoch=False).
"""
from __future__ import annotations

import math
import re
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def cyclic_schedule(base: float, total_steps: int,
                    target_ratio: Tuple[float, float] = (2.0, 1e-4),
                    step_ratio_up: float = 0.4):
    """mmcv CyclicLrUpdaterHook with cyclic_times=1, anneal 'cos'."""
    up_steps = int(total_steps * step_ratio_up)

    def sched(step):
        step = jnp.minimum(step, total_steps - 1)
        in_up = step < up_steps
        pct_up = step / jnp.maximum(up_steps, 1)
        pct_dn = (step - up_steps) / jnp.maximum(total_steps - up_steps, 1)
        lr_up = annealing_cos(base * 1.0, base * target_ratio[0], pct_up)
        lr_dn = annealing_cos(base * target_ratio[0],
                              base * target_ratio[1], pct_dn)
        return jnp.where(in_up, lr_up, lr_dn)

    return sched


def cyclic_momentum_schedule(base: float, total_steps: int,
                             target_ratio: Tuple[float, float] = (
                                 0.8947368421052632, 1.0),
                             step_ratio_up: float = 0.4):
    """mmcv CyclicMomentumUpdaterHook (same phase algebra, applied to
    beta1)."""
    up_steps = int(total_steps * step_ratio_up)

    def sched(step):
        step = jnp.minimum(step, total_steps - 1)
        in_up = step < up_steps
        pct_up = step / jnp.maximum(up_steps, 1)
        pct_dn = (step - up_steps) / jnp.maximum(total_steps - up_steps, 1)
        m_up = annealing_cos(base * 1.0, base * target_ratio[0], pct_up)
        m_dn = annealing_cos(base * target_ratio[0],
                             base * target_ratio[1], pct_dn)
        return jnp.where(in_up, m_up, m_dn)

    return sched


DEFAULT_PARAM_GROUPS: Dict[str, Tuple[float, float]] = {
    # substring -> (lr_mult, decay_mult), reference paramwise_cfg
    "img_backbone": (0.01, 5.0),
    "img_neck": (0.1, 1.0),
}


def _group_label(path: Tuple[str, ...],
                 groups: Mapping[str, Tuple[float, float]]) -> str:
    joined = "/".join(str(p) for p in path)
    for key in groups:
        if key in joined:
            return key
    return "default"


def make_optimizer(
    params,
    total_steps: int,
    base_lr: float = 1e-4,
    weight_decay: float = 0.01,
    clip_norm: float = 35.0,
    param_groups: Optional[Mapping[str, Tuple[float, float]]] = None,
    lr_target_ratio: Tuple[float, float] = (2.0, 1e-4),
    momentum_target_ratio: Tuple[float, float] = (0.8947368421052632, 1.0),
    step_ratio_up: float = 0.4,
    base_beta1: float = 0.9,
):
    """Build the full optax chain (+ the labels pytree for inspection)."""
    groups = dict(DEFAULT_PARAM_GROUPS if param_groups is None
                  else param_groups)
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _group_label(
            tuple(getattr(k, "key", getattr(k, "idx", k)) for k in path),
            groups),
        params)

    beta1_sched = cyclic_momentum_schedule(
        base_beta1, total_steps, momentum_target_ratio, step_ratio_up)

    def adamw_for(mult: float, decay_mult: float):
        lr_sched = cyclic_schedule(
            base_lr * mult, total_steps, lr_target_ratio, step_ratio_up)
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_sched, b1=beta1_sched,
            weight_decay=weight_decay * decay_mult)

    transforms = {"default": adamw_for(1.0, 1.0)}
    for key, (lr_mult, decay_mult) in groups.items():
        transforms[key] = adamw_for(lr_mult, decay_mult)

    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.multi_transform(transforms, labels),
    )
    return tx, labels
