"""Hard voxelization as a static-shape XLA program (spconv replacement).

The reference wraps `spconv.pytorch.utils.PointToVoxel`
(mmcv_custom/ops/voxel/spconv_voxelize.py:11-71): hash points into a voxel
grid, cap points/voxel (10) and voxels (120k train / 160k eval). CUDA spconv
uses a hash table; on TPU we use the sort-based equivalent, which XLA maps to
an efficient on-chip bitonic sort and keeps every shape static:

    point -> voxel id -> argsort -> run-length segmentation -> scatter

Outputs are padded `(voxels, coords, num_points, voxel_mask)`; empty slots are
zero, coords of empty slots are -1 (mirrors spconv's convention downstream).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class VoxelizationOutput(NamedTuple):
    voxels: jnp.ndarray      # (max_voxels, max_points, F)
    coords: jnp.ndarray      # (max_voxels, 3) int32 (z, y, x); -1 pad
    num_points: jnp.ndarray  # (max_voxels,) int32
    mask: jnp.ndarray        # (max_voxels,) bool


def compute_voxel_coords(
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    voxel_size: Sequence[float],
    pc_range: Sequence[float],
    grid_size: Sequence[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point integer voxel coords (z, y, x) and validity."""
    vs = jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(pc_range[:3], points.dtype)
    gxyz = jnp.floor((points[..., :3] - lo) / vs).astype(jnp.int32)
    gs = jnp.asarray(grid_size, jnp.int32)  # (X, Y, Z)
    valid = point_mask & jnp.all(gxyz >= 0, axis=-1) & jnp.all(
        gxyz < gs, axis=-1)
    zyx = gxyz[..., ::-1]
    return zyx, valid


@partial(jax.jit, static_argnames=(
    "voxel_size", "pc_range", "grid_size", "max_points", "max_voxels"))
def voxelize(
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    *,
    voxel_size: Tuple[float, ...],
    pc_range: Tuple[float, ...],
    grid_size: Tuple[int, ...],
    max_points: int = 10,
    max_voxels: int = 120000,
) -> VoxelizationOutput:
    """Hard-voxelize one point cloud.

    Args:
        points: (N, F) padded point array (xyz + features).
        point_mask: (N,) validity of each point slot.
        grid_size: (X, Y, Z) number of cells per axis.
    """
    n = points.shape[0]
    zyx, valid = compute_voxel_coords(
        points, point_mask, voxel_size, pc_range, grid_size)
    gx, gy, _gz = grid_size
    lin = (zyx[:, 0] * gy + zyx[:, 1]) * gx + zyx[:, 2]
    sentinel = jnp.iinfo(jnp.int32).max
    lin = jnp.where(valid, lin, sentinel)

    order = jnp.argsort(lin)  # stable; invalids go last
    slin = lin[order]
    svalid = valid[order]

    idx = jnp.arange(n, dtype=jnp.int32)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), slin[1:] != slin[:-1]]) & svalid
    vrank = jnp.cumsum(head.astype(jnp.int32)) - 1  # voxel slot per point
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(head, idx, -1))
    pos = idx - run_start  # rank within the voxel

    keep = svalid & (vrank >= 0) & (vrank < max_voxels) & (pos < max_points)
    scat_v = jnp.where(keep, vrank, max_voxels)  # out-of-range rows dropped
    scat_p = jnp.where(keep, pos, 0)

    voxels = jnp.zeros(
        (max_voxels, max_points, points.shape[-1]), points.dtype)
    voxels = voxels.at[scat_v, scat_p].set(
        points[order], mode="drop", unique_indices=True)

    head_keep = head & keep
    coords = jnp.full((max_voxels, 3), -1, jnp.int32)
    coords = coords.at[jnp.where(head_keep, vrank, max_voxels)].set(
        zyx[order], mode="drop")

    num_points = jnp.zeros((max_voxels,), jnp.int32)
    num_points = num_points.at[scat_v].add(
        keep.astype(jnp.int32), mode="drop")

    vmask = jnp.zeros((max_voxels,), bool)
    vmask = vmask.at[jnp.where(head_keep, vrank, max_voxels)].set(
        True, mode="drop")
    return VoxelizationOutput(voxels, coords, num_points, vmask)


def hard_simple_vfe(vox: VoxelizationOutput) -> jnp.ndarray:
    """Mean of the points in each voxel (mmdet3d HardSimpleVFE, used as
    `pts_voxel_encoder` in every LiDAR config, coop config:239-242).

    Returns (max_voxels, F) voxel features; empty voxels are zero.
    """
    s = jnp.sum(vox.voxels, axis=1)
    n = jnp.maximum(vox.num_points, 1).astype(vox.voxels.dtype)
    return jnp.where(vox.mask[:, None], s / n[:, None], 0.0)
