"""Hard voxelization as a static-shape, scatter-free XLA program.

The reference wraps `spconv.pytorch.utils.PointToVoxel`
(mmcv_custom/ops/voxel/spconv_voxelize.py:11-71): hash points into a voxel
grid, cap points/voxel (10) and voxels (120k train / 160k eval). CUDA spconv
uses a hash table; the TPU-native formulation is sort-based — and, crucially,
*gather-only*: TPU scatters serialize, so every "place this point into its
voxel slot" step is re-expressed as "which point fills this slot", resolved
with vectorized binary search over the sorted voxel ids:

    point -> voxel id -> argsort -> run starts via searchsorted ->
    voxels[v, p] = sorted_points[start[v] + p]

Outputs are padded `(voxels, coords, num_points, voxel_mask)`; empty slots
are zero, coords of empty slots are -1.
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
    spts = points[order]
    szyx = zyx[order]

    head = jnp.concatenate(
        [jnp.ones((1,), bool), slin[1:] != slin[:-1]]) & (slin != sentinel)
    vrank = jnp.cumsum(head.astype(jnp.int32)) - 1  # voxel id per point
    vrank = jnp.where(slin == sentinel, jnp.iinfo(jnp.int32).max, vrank)
    n_voxels = jnp.where(head.any(), vrank_max_plus1(vrank, head), 0)

    # run start of each voxel slot — vrank is sorted, so a binary search
    # replaces the scatter
    slots = jnp.arange(max_voxels, dtype=jnp.int32)
    starts = jnp.searchsorted(vrank, slots, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(vrank, slots, side="right").astype(jnp.int32)
    vmask = slots < n_voxels
    counts = jnp.minimum(ends - starts, max_points)
    counts = jnp.where(vmask, counts, 0)

    # gather the first max_points member points of each voxel
    gather_idx = starts[:, None] + jnp.arange(max_points, dtype=jnp.int32)
    in_voxel = jnp.arange(max_points)[None, :] < counts[:, None]
    gather_idx = jnp.minimum(gather_idx, n - 1)
    voxels = jnp.where(
        in_voxel[..., None], spts[gather_idx], 0.0)

    coords = jnp.where(
        vmask[:, None], szyx[jnp.minimum(starts, n - 1)], -1)
    return VoxelizationOutput(voxels, coords, counts, vmask)


def vrank_max_plus1(vrank, head):
    """Number of distinct voxels = last valid rank + 1."""
    valid_ranks = jnp.where(
        vrank == jnp.iinfo(jnp.int32).max, -1, vrank)
    return jnp.max(valid_ranks) + 1


def hard_simple_vfe(vox: VoxelizationOutput) -> jnp.ndarray:
    """Mean of the points in each voxel (mmdet3d HardSimpleVFE, used as
    `pts_voxel_encoder` in every LiDAR config, coop config:239-242).

    Returns (max_voxels, F) voxel features; empty voxels are zero.
    """
    s = jnp.sum(vox.voxels, axis=1)
    n = jnp.maximum(vox.num_points, 1).astype(vox.voxels.dtype)
    return jnp.where(vox.mask[:, None], s / n[:, None], 0.0)
