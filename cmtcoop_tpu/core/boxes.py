"""3D box math: codec, coordinate conventions, and rigid transforms.

Box layout convention (matches the reference's LiDARInstance3DBoxes with
origin (0.5, 0.5, 0.5), i.e. gravity-centered boxes):
    box9 = (cx, cy, cz, w, l, h, yaw, vx, vy)   cz at the box *center*
    box7 = (cx, cy, cz, w, l, h, yaw)

The normalized 10-dim regression code (reference:
projects/mmdet3d_plugin/core/bbox/util.py:8-35) is
    (cx, cy, cz, log w, log l, log h, sin yaw, cos yaw, vx, vy)

All functions are pure jnp and jit-safe with static shapes.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_bbox(boxes: jnp.ndarray) -> jnp.ndarray:
    """box9/box7 -> 10/8-dim regression target.

    Mirrors reference core/bbox/util.py:8-35 (normalize_bbox): centers pass
    through, sizes go to log-space, yaw becomes (sin, cos), velocity passes
    through when present.
    """
    cx, cy, cz = boxes[..., 0:1], boxes[..., 1:2], boxes[..., 2:3]
    dims = jnp.log(boxes[..., 3:6])
    yaw = boxes[..., 6:7]
    parts = [cx, cy, cz, dims, jnp.sin(yaw), jnp.cos(yaw)]
    if boxes.shape[-1] > 7:
        parts.append(boxes[..., 7:9])
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(code: jnp.ndarray) -> jnp.ndarray:
    """10/8-dim regression code -> box9/box7.

    Mirrors reference core/bbox/util.py:38-68 (denormalize_bbox):
    yaw = atan2(sin, cos), sizes exp'd back.
    """
    center = code[..., 0:3]
    dims = jnp.exp(code[..., 3:6])
    yaw = jnp.arctan2(code[..., 6:7], code[..., 7:8])
    parts = [center, dims, yaw]
    if code.shape[-1] > 8:
        parts.append(code[..., 8:10])
    return jnp.concatenate(parts, axis=-1)


def bottom_to_gravity_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """Shift z from box bottom to box center (cz += h/2).

    The reference stores LiDAR boxes bottom-centered on disk and converts with
    `gravity_center` before matching/DN (cmt_head.py:574-576).
    """
    cz = boxes[..., 2:3] + boxes[..., 5:6] * 0.5
    return jnp.concatenate([boxes[..., 0:2], cz, boxes[..., 3:]], axis=-1)


def gravity_to_bottom_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`bottom_to_gravity_center` (cmt_head.py:914)."""
    cz = boxes[..., 2:3] - boxes[..., 5:6] * 0.5
    return jnp.concatenate([boxes[..., 0:2], cz, boxes[..., 3:]], axis=-1)


def rotate_points_z(points: jnp.ndarray, angle) -> jnp.ndarray:
    """Rotate (..., 3+) points around +z by `angle` (radians, scalar or
    broadcastable). Counter-clockwise in the x-y plane, matching mmdet3d's
    `rotation_3d_in_axis` convention used by GlobalRotScaleTrans."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[..., 0] * c - points[..., 1] * s
    y = points[..., 0] * s + points[..., 1] * c
    return jnp.concatenate(
        [jnp.stack([x, y], axis=-1), points[..., 2:]], axis=-1)


def transform_points(points: jnp.ndarray, mat4: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 homogeneous transform to (..., 3+) points; extra feature
    channels (intensity, ts) pass through untouched.

    TPU-native equivalent of VehiclePointsToInfraCoords
    (transforms_3d_coop.py:194-211)."""
    xyz = points[..., :3]
    xyz = xyz @ mat4[:3, :3].T + mat4[:3, 3]
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def transform_boxes(boxes: jnp.ndarray, mat4: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid 4x4 (rotation about z + translation) to box9 arrays."""
    center = boxes[..., :3] @ mat4[:3, :3].T + mat4[:3, 3]
    dyaw = jnp.arctan2(mat4[1, 0], mat4[0, 0])
    yaw = boxes[..., 6:7] + dyaw
    out = [center, boxes[..., 3:6], yaw]
    if boxes.shape[-1] > 7:
        vel = boxes[..., 7:9] @ mat4[:2, :2].T
        out.append(vel)
    return jnp.concatenate(out, axis=-1)


def box_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 7+) boxes -> (..., 4, 2) BEV corner coordinates.

    Corner order: the 4 corners of the (w, l) rectangle rotated by yaw.
    Used by host-side collision tests and the eval protocol.
    """
    w, l, yaw = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    # local corners (+-w/2, +-l/2); w along x, l along y before rotation
    sx = jnp.stack([w, w, -w, -w], axis=-1) * 0.5
    sy = jnp.stack([l, -l, -l, l], axis=-1) * 0.5
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    cx = boxes[..., 0:1] + sx * c - sy * s
    cy = boxes[..., 1:2] + sx * s + sy * c
    return jnp.stack([cx, cy], axis=-1)


def normalize_01(xyz: jnp.ndarray, pc_range) -> jnp.ndarray:
    """Map metric (x, y, z) into [0, 1]^3 using the point-cloud range."""
    lo = jnp.asarray(pc_range[:3], dtype=xyz.dtype)
    hi = jnp.asarray(pc_range[3:], dtype=xyz.dtype)
    return (xyz - lo) / (hi - lo)


def denormalize_01(xyz01: jnp.ndarray, pc_range) -> jnp.ndarray:
    """Inverse of :func:`normalize_01`."""
    lo = jnp.asarray(pc_range[:3], dtype=xyz01.dtype)
    hi = jnp.asarray(pc_range[3:], dtype=xyz01.dtype)
    return xyz01 * (hi - lo) + lo


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Numerically clamped logit, matching mmdet's `inverse_sigmoid`
    (used at cmt_head.py:471, 560)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1) - jnp.log(x2)
