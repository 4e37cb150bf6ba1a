"""Checkpointing: orbax save/restore + cross-topology key surgery.

Replaces the mmcv CheckpointHook (interval=1, max_keep_ckpts=5, coop
config:391-394) and the checkpoint converter
(tools/model_converters/convert_cmtcoop_checkpoints.py:156-372): single-agent
checkpoints can be grafted into the coop topology by prefixing their params
under vehicle_model/infrastructure_model, optionally dropping task heads.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    max_keep: int = 5) -> None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.CheckpointManager(
        ckpt_dir,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_keep),
    ) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))


def latest_step(ckpt_dir: str) -> Optional[int]:
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        return mngr.latest_step()


def restore_checkpoint(ckpt_dir: str, target: Any,
                       step: Optional[int] = None) -> Any:
    """Full resume (`resume_from`). `target` provides structure/shardings."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = mngr.latest_step() if step is None else step
        return mngr.restore(step, args=ocp.args.StandardRestore(target))


# ------------------------ cross-topology surgery -------------------------

def graft_single_agent_params(
    coop_params: Dict,
    agent_params: Dict,
    agent: str,
    include_head: bool = False,
    include_head_tasks: bool = False,
) -> Dict:
    """Insert a single-agent CmtDetector's params into a coop tree.

    Mirrors update_ckpt_vehicle/update_ckpt_infrastructure
    (convert_cmtcoop_checkpoints.py:156-288): the extractor goes under
    `vehicle_model`/`infrastructure_model`; the head is optionally copied
    (task heads dropped by default, as the reference does when assembling
    the coop warm start).
    """
    assert agent in ("vehicle", "infrastructure")
    out = jax.tree_util.tree_map(lambda x: x, coop_params)  # shallow copy
    out[f"{agent}_model"] = agent_params["extractor"]
    if include_head:
        src_head = dict(agent_params["pts_bbox_head"])
        if not include_head_tasks:
            src_head = {k: v for k, v in src_head.items()
                        if not k.startswith("task_heads")}
        dst_head = dict(out["pts_bbox_head"])
        dst_head.update(src_head)
        out["pts_bbox_head"] = dst_head
    return out


def merge_modalities(fusion_params: Dict, lidar_params: Dict,
                     camera_params: Dict) -> Dict:
    """Merge separate LiDAR-only + camera-only detector params into a fusion
    tree (the reference merges lidar+camera ckpts the same way,
    convert_cmtcoop_checkpoints.py:291-372)."""
    out = jax.tree_util.tree_map(lambda x: x, fusion_params)
    ext = dict(out["extractor"])
    for k in ("pts_middle_encoder", "pts_backbone", "pts_neck"):
        if k in lidar_params["extractor"]:
            ext[k] = lidar_params["extractor"][k]
    for k in ("img_backbone", "img_neck"):
        if k in camera_params["extractor"]:
            ext[k] = camera_params["extractor"][k]
    out["extractor"] = ext
    return out
