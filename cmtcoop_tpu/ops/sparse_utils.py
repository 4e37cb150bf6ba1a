"""Static-shape sparse-tensor utilities: sorted coord sets + neighbor lookup.

A sparse 3D tensor is (coords, features, mask) with a *sorted* invariant:
active voxels come first in ascending linearized (z, y, x) order, padding
rows afterwards. This replaces spconv's GPU hash tables with sorted binary
search (`jnp.searchsorted`), which vectorizes cleanly on the TPU VPU — the
TPU-native answer to the reference's spconv dependency
(mmcv_custom/ops/voxel/spconv_voxelize.py:5, config pts_middle_encoder).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max


class SparseGrid(NamedTuple):
    """Active voxel set over a (D, H, W) grid. Sorted by linear id."""
    coords: jnp.ndarray  # (V, 3) int32 (z, y, x); -1 on padding rows
    mask: jnp.ndarray    # (V,) bool
    shape: Tuple[int, int, int]  # static (D, H, W)

    @property
    def linear_ids(self) -> jnp.ndarray:
        d, h, w = self.shape
        lin = (self.coords[:, 0] * h + self.coords[:, 1]) * w + \
            self.coords[:, 2]
        return jnp.where(self.mask, lin, INT32_MAX)


def lookup(grid: SparseGrid, query_coords: jnp.ndarray,
           query_valid: jnp.ndarray) -> jnp.ndarray:
    """Find the row index of each query coordinate in `grid`.

    Args:
        query_coords: (..., 3) int32 (z, y, x).
        query_valid: (...,) bool.
    Returns:
        (...,) int32 index into grid rows, or V (one-past-end) on miss. The
        caller should gather from features padded with a zero row at V.
    """
    d, h, w = grid.shape
    v = grid.coords.shape[0]
    lin = grid.linear_ids
    qlin = (query_coords[..., 0] * h + query_coords[..., 1]) * w + \
        query_coords[..., 2]
    flat = qlin.reshape(-1)
    pos = jnp.searchsorted(lin, flat, side="left").astype(jnp.int32)
    pos_c = jnp.minimum(pos, v - 1)
    hit = (lin[pos_c] == flat) & (pos < v)
    hit = hit & query_valid.reshape(-1)
    idx = jnp.where(hit, pos_c, v)
    return idx.reshape(qlin.shape)


def kernel_offsets(kernel_size: Sequence[int]) -> jnp.ndarray:
    """(K, 3) integer offsets for a (kz, ky, kx) kernel, centered for odd
    sizes (offset = k - kernel//2), ordered z-major — the layout our conv
    weights (K, Cin, Cout) use."""
    kz, ky, kx = kernel_size
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(kz), jnp.arange(ky), jnp.arange(kx), indexing="ij")
    return jnp.stack(
        [zz.reshape(-1), yy.reshape(-1), xx.reshape(-1)], axis=-1
    ).astype(jnp.int32)


def subm_neighbor_map(grid: SparseGrid,
                      kernel_size: Sequence[int] = (3, 3, 3)) -> jnp.ndarray:
    """(V, K) gather indices for a submanifold conv on `grid`.

    Output sites == input sites (spconv SubMConv3d semantics). Missing
    neighbors map to index V (zero row). Computed once per active set and
    shared by every submanifold conv in a stage — the equivalent of spconv's
    `indice_key` reuse.
    """
    offs = kernel_offsets(kernel_size) - (
        jnp.asarray(kernel_size, jnp.int32) - 1) // 2
    nbr = grid.coords[:, None, :] + offs[None, :, :]  # (V, K, 3)
    shp = jnp.asarray(grid.shape, jnp.int32)
    valid = jnp.all(nbr >= 0, axis=-1) & jnp.all(nbr < shp, axis=-1)
    valid &= grid.mask[:, None]
    return lookup(grid, nbr, valid)


def downsample_output_grid(
    grid: SparseGrid,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    max_out: int,
) -> SparseGrid:
    """Active output set of a strided sparse conv (spconv SparseConv3d).

    Output site o (per axis) receives input p iff k = p + pad - o*s lies in
    [0, ksize). We enumerate, per input voxel, the <=2 output candidates per
    axis (k=3, s<=2), take the cross product, and sort-unique with a static
    cap `max_out`.
    """
    out_shape = tuple(
        (grid.shape[a] + 2 * padding[a] - kernel_size[a]) // stride[a] + 1
        for a in range(3))

    cand_axes = []
    cand_valid_axes = []
    for a in range(3):
        p = grid.coords[:, a]
        s, k, pad = stride[a], kernel_size[a], padding[a]
        # o in [ceil((p+pad-k+1)/s), floor((p+pad)/s)]
        lo = -((-(p + pad - k + 1)) // s)
        hi = (p + pad) // s
        n_cand = (k + s - 1) // s  # static upper bound on hi-lo+1
        offs = jnp.arange(n_cand, dtype=jnp.int32)
        o = lo[:, None] + offs[None, :]
        ok = (o <= hi[:, None]) & (o >= 0) & (o < out_shape[a])
        cand_axes.append(o)
        cand_valid_axes.append(ok)

    nz = cand_axes[0].shape[1]
    ny = cand_axes[1].shape[1]
    nx = cand_axes[2].shape[1]
    v = grid.coords.shape[0]
    oz = jnp.broadcast_to(cand_axes[0][:, :, None, None], (v, nz, ny, nx))
    oy = jnp.broadcast_to(cand_axes[1][:, None, :, None], (v, nz, ny, nx))
    ox = jnp.broadcast_to(cand_axes[2][:, None, None, :], (v, nz, ny, nx))
    okz = jnp.broadcast_to(
        cand_valid_axes[0][:, :, None, None], (v, nz, ny, nx))
    oky = jnp.broadcast_to(
        cand_valid_axes[1][:, None, :, None], (v, nz, ny, nx))
    okx = jnp.broadcast_to(
        cand_valid_axes[2][:, None, None, :], (v, nz, ny, nx))
    ok = (okz & oky & okx) & grid.mask[:, None, None, None]

    od, oh, ow = out_shape
    lin = (oz * oh + oy) * ow + ox
    lin = jnp.where(ok, lin, INT32_MAX).reshape(-1)
    slin = jnp.sort(lin)
    head = jnp.concatenate([jnp.ones((1,), bool), slin[1:] != slin[:-1]])
    head &= slin != INT32_MAX
    # scatter-free unique: rank is sorted, so the position of the k-th
    # distinct value is a binary search (TPU scatters serialize; gathers
    # vectorize)
    rank = jnp.cumsum(head.astype(jnp.int32)) - 1
    rank = jnp.where(slin == INT32_MAX, INT32_MAX, rank)
    n_uniq = jnp.maximum(
        jnp.max(jnp.where(rank == INT32_MAX, -1, rank)) + 1, 0)
    slots = jnp.arange(max_out, dtype=jnp.int32)
    pos = jnp.searchsorted(rank, slots, side="left").astype(jnp.int32)
    uniq = slin[jnp.minimum(pos, slin.shape[0] - 1)]
    out_mask = slots < n_uniq
    uniq = jnp.where(out_mask, uniq, INT32_MAX)
    lz = uniq // (oh * ow)
    rem = uniq - lz * (oh * ow)
    ly = rem // ow
    lx = rem - ly * ow
    out_coords = jnp.where(
        out_mask[:, None],
        jnp.stack([lz, ly, lx], axis=-1), -1).astype(jnp.int32)
    return SparseGrid(out_coords, out_mask, out_shape)


def conv_neighbor_map(
    in_grid: SparseGrid,
    out_grid: SparseGrid,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
) -> jnp.ndarray:
    """(V_out, K) gather indices into `in_grid` rows for a strided conv:
    input coord for output o at kernel index k is o*s + k - pad."""
    offs = kernel_offsets(kernel_size)
    s = jnp.asarray(stride, jnp.int32)
    pad = jnp.asarray(padding, jnp.int32)
    src = out_grid.coords[:, None, :] * s + offs[None, :, :] - pad
    shp = jnp.asarray(in_grid.shape, jnp.int32)
    valid = jnp.all(src >= 0, axis=-1) & jnp.all(src < shp, axis=-1)
    valid &= out_grid.mask[:, None]
    return lookup(in_grid, src, valid)


def gather_conv(features: jnp.ndarray, nbr_idx: jnp.ndarray,
                weights: jnp.ndarray, out_rows: int | None = None,
                precision=None) -> jnp.ndarray:
    """Sparse conv compute: out[i] = sum_k W[k] @ feat[nbr_idx[i, k]].

    Args:
        features: (V_in, Cin); a zero row is appended internally so index
            V_in (miss) contributes nothing.
        nbr_idx: (V_out, K) gather map.
        weights: (K, Cin, Cout).
    Returns:
        (V_out, Cout).

    The gather feeds one large (V_out, K*Cin) x (K*Cin, Cout) contraction so
    the MXU sees a single big matmul per layer.
    """
    v_out, k = nbr_idx.shape
    cin, cout = weights.shape[1], weights.shape[2]
    padded = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), features.dtype)], axis=0)
    gathered = padded[nbr_idx.reshape(-1)].reshape(v_out, k * cin)
    w = weights.reshape(k * cin, cout).astype(features.dtype)
    return jax.lax.dot_general(
        gathered, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision).astype(features.dtype)


def sparse_to_dense(grid: SparseGrid, features: jnp.ndarray) -> jnp.ndarray:
    """Densify (V, C) features to (D, H, W, C) (spconv `.dense()` at the
    encoder output). Gather-based: for every dense cell, binary-search the
    sorted active set — a scatter here would serialize on TPU."""
    d, h, w = grid.shape
    v, c = features.shape
    lin = grid.linear_ids
    cells = jnp.arange(d * h * w, dtype=jnp.int32)
    pos = jnp.searchsorted(lin, cells, side="left").astype(jnp.int32)
    pos_c = jnp.minimum(pos, v - 1)
    hit = lin[pos_c] == cells
    dense = jnp.where(hit[:, None], features[pos_c], 0.0)
    return dense.reshape(d, h, w, c)
