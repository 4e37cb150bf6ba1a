"""Static-shape sparse-tensor utilities: sorted coord sets + neighbor lookup.

A sparse 3D tensor is (coords, features, mask) with a *sorted* invariant:
active voxels come first in ascending linearized (z, y, x) order, padding
rows afterwards. This replaces spconv's GPU hash tables with sorted binary
search (`jnp.searchsorted`), which vectorizes cleanly on the TPU VPU — the
TPU-native answer to the reference's spconv dependency
(mmcv_custom/ops/voxel/spconv_voxelize.py:5, config pts_middle_encoder).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

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


def sorted_lookup(keys: jnp.ndarray, queries: jnp.ndarray,
                  block: int = 128, window: int = 512,
                  exact: Optional[bool] = None,
                  return_overflow: bool = False,
                  run: int = 1,
                  kernel: Optional[bool] = None):
    """(positions, hit[, overflow]) of *sorted* int32 queries in sorted
    int32 keys.

    XLA's searchsorted gathers one scalar per query per bisection step,
    which runs ~1000x off HBM peak on TPU (measured: 393 ms for 3.2M
    queries). With sorted queries the problem is a merge: binary-search only
    every `block`-th query (cheap), then resolve each query by counting keys
    inside a contiguous `window` slice starting at its block's start —
    dynamic-slice loads + broadcast compares, all VPU.

    With `run` > 1, resolves queries+d for every d in [0, run) in the SAME
    window pass, returning pos/hit shaped (n, run). For integer keys
    count(keys < q+d+1) == count(keys <= q+d), so a run of r deltas costs
    r+1 compare-counts instead of 2r, and shares the block starts + windows
    — this is what makes 3x3 neighbor maps cheap: the three dx taps of one
    dy row are consecutive linear ids (one run-3 lookup per dy instead of
    three independent ones).

    Exact iff no query block spans more than `window` keys — guaranteed when
    queries are at least as locally dense as keys (e.g. dense-cell queries,
    or rank queries with a bounded duplicate count). Callers whose query
    distribution is NOT guaranteed (neighbor maps across extreme density
    transitions) must pass `return_overflow=True` and fall back to the
    exact path when the flag fires — see `lookup`. `exact=True` uses
    jnp.searchsorted (CPU default / oracle).
    """
    n = queries.shape[0]
    nk = keys.shape[0]
    big = jnp.iinfo(jnp.int32).max
    if exact or (exact is None and jax.default_backend() == "cpu"):
        def one(d):
            q = jnp.where(queries == big, big, queries + d)
            pos = jnp.searchsorted(keys, q, side="left").astype(jnp.int32)
            pos_c = jnp.minimum(pos, nk - 1)
            hit = (keys[pos_c] == q) & (pos < nk)
            return pos, hit
        if run == 1:
            pos, hit = one(0)
        else:
            ps, hs = zip(*(one(d) for d in range(run)))
            pos = jnp.stack(ps, axis=-1)
            hit = jnp.stack(hs, axis=-1)
        if return_overflow:
            return pos, hit, jnp.zeros((), bool)
        return pos, hit

    pad = (-n) % block
    queries_p = jnp.concatenate(
        [queries, jnp.full((pad,), big, queries.dtype)]) if pad else queries
    nb = queries_p.shape[0] // block
    q_blocks = queries_p.reshape(nb, block)

    starts = jnp.searchsorted(
        keys, q_blocks[:, 0], side="left").astype(jnp.int32)
    next_starts = jnp.concatenate(
        [starts[1:], jnp.asarray([nk], jnp.int32)])

    keys_pad = jnp.concatenate(
        [keys, jnp.full((window,), big, keys.dtype)])
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(keys_pad, (s,), (window,))
    )(starts)  # (nb, window) contiguous slices

    if kernel is None:
        kernel = False  # A/B on v5e: Pallas 0.585 ms vs XLA 0.417 at L0
    if kernel:
        # Pallas compare-count (ops/lookup_kernel.py): bit-identical
        # (oracle-tested) but slower than the unrolled XLA lowering at
        # bench shapes — kept as a measured alternative, off by default.
        from cmtcoop_tpu.ops.lookup_kernel import window_counts
        c = window_counts(q_blocks, windows, run=run,
                          interpret=jax.default_backend() != "tpu")
        counts = [c[:, d] for d in range(run + 1)]
    else:
        # compare-count in (at most) 512-wide chunks, UNROLLED — the
        # previous lax.scan chunking cost +35% in dispatch/carry overhead
        # at bench shapes (tools/probe_lookup2.py: 0.45 -> 0.33 ms at L0).
        # XLA fuses the broadcast-compare into the lane reduction, so the
        # (nb, block, chunk) intermediate is never materialized. lt[d]
        # counts keys < q + d for d in 0..run (lt[run] doubles as le of
        # q+run-1).
        chunk = min(512, window)
        counts = [jnp.zeros((nb, block), jnp.int32)
                  for _ in range(run + 1)]
        for i in range(window // chunk):
            wc = jax.lax.slice_in_dim(windows, i * chunk,
                                      (i + 1) * chunk, axis=1)
            counts = [
                cc + jnp.sum(wc[:, None, :] < q_blocks[:, :, None] + d,
                             axis=-1, dtype=jnp.int32)
                for d, cc in enumerate(counts)]

    def resolve(d):
        pos = jnp.minimum(starts[:, None] + counts[d], next_starts[:, None])
        hit = (counts[d + 1] > counts[d]) & (q_blocks != big)
        return pos.reshape(-1)[:n], hit.reshape(-1)[:n]

    if run == 1:
        pos, hit = resolve(0)
    else:
        ps, hs = zip(*(resolve(d) for d in range(run)))
        pos = jnp.stack(ps, axis=-1)
        hit = jnp.stack(hs, axis=-1)
    if return_overflow:
        # a block is resolved exactly iff every key its REAL queries can
        # map to lies inside the window: the insertion point (side=right,
        # so the equal key is included) of the block's last real query
        # (+ run - 1) must be within `window` of the block start. Sentinel
        # (big) queries never hit, so they don't constrain the window.
        neg = jnp.iinfo(jnp.int32).min
        q_last = jnp.max(jnp.where(q_blocks == big, neg, q_blocks), axis=1)
        ends = jnp.searchsorted(
            keys, q_last + (run - 1), side="right").astype(jnp.int32)
        overflow = jnp.any(ends - starts > window)
        return pos, hit, overflow
    return pos, hit


def guarded_lookup(keys: jnp.ndarray, qlin_t: jnp.ndarray,
                   exact: Optional[bool] = None,
                   window: int = 512):
    """Columnwise windowed lookup of (K, N) sorted query columns with a
    runtime exactness guard: if any block window overflows (extreme density
    transition), recompute ALL columns with exact searchsorted via lax.cond
    — never silently wrong (the windowed result is biased to 'miss').

    NOTE: must not be called under jax.vmap (cond would become select and
    execute the expensive exact branch unconditionally) — batch with
    jax.lax.map instead, as the encoders do."""
    if exact or (exact is None and jax.default_backend() == "cpu"):
        return jax.vmap(
            lambda col: sorted_lookup(keys, col, exact=True))(qlin_t)
    pos_t, hit_t, ovf = jax.vmap(
        lambda col: sorted_lookup(keys, col, window=window, exact=exact,
                                  return_overflow=True))(qlin_t)

    def exact_all(_):
        p, h = jax.vmap(
            lambda col: sorted_lookup(keys, col, exact=True))(qlin_t)
        return p, h

    return jax.lax.cond(
        jnp.any(ovf), exact_all, lambda _: (pos_t, hit_t), None)


def lookup(grid: SparseGrid, query_coords: jnp.ndarray,
           query_valid: jnp.ndarray,
           row_mask: Optional[jnp.ndarray] = None,
           exact: Optional[bool] = None) -> jnp.ndarray:
    """Find the row index of each query coordinate in `grid`.

    Args:
        query_coords: (N, K, 3) int32 (z, y, x); each column k must be
            monotone in the row's linear id (true for kernel-offset queries
            of a sorted active set — the offset is an additive constant).
        query_valid: (N, K) bool (bounds validity per offset).
        row_mask: (N,) validity of the query rows themselves (padding rows
            are pushed to a +inf sentinel to preserve per-column order).
    Returns:
        (N, K) int32 index into grid rows, or V (one-past-end) on miss. The
        caller should gather from features padded with a zero row at V.
    """
    d, h, w = grid.shape
    v = grid.coords.shape[0]
    lin = grid.linear_ids
    qlin = (query_coords[..., 0] * h + query_coords[..., 1]) * w + \
        query_coords[..., 2]
    if row_mask is not None:
        qlin = jnp.where(row_mask[:, None], qlin, INT32_MAX)

    # vmapped over the K kernel offsets; the chunked count inside
    # sorted_lookup bounds the peak intermediate to (K, nb, block, chunk)
    pos_t, hit_t = guarded_lookup(lin, jnp.swapaxes(qlin, 0, 1), exact=exact)
    pos = jnp.swapaxes(pos_t, 0, 1)
    hit = jnp.swapaxes(hit_t, 0, 1) & query_valid
    return jnp.where(hit, jnp.minimum(pos, v - 1), v)


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
    return lookup(grid, nbr, valid, row_mask=grid.mask)


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
    # up to 27 inputs can nominate the same output cell -> duplicate ranks;
    # window must cover block*27 worst-case span
    pos, _ = sorted_lookup(rank, slots, window=4096)
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
    return lookup(in_grid, src, valid, row_mask=out_grid.mask)


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

    One gather + one (V, Cin) x (Cin, Cout) matmul per kernel offset,
    accumulated in f32. Per-offset gathers have *monotone* indices (a
    kernel offset is an additive shift of the sorted linear ids), so the
    HBM access pattern is near-sequential — measurably faster than one
    combined (V, K*Cin) gather, and the peak intermediate is K times
    smaller.
    """
    v_out, k = nbr_idx.shape
    cin, cout = weights.shape[1], weights.shape[2]
    padded = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), features.dtype)], axis=0)
    w = weights.astype(features.dtype)
    acc = jnp.zeros((v_out, cout), jnp.float32)
    for kk in range(k):
        acc = acc + jax.lax.dot_general(
            padded[nbr_idx[:, kk]], w[kk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
    return acc.astype(features.dtype)


def sparse_to_dense(grid: SparseGrid, features: jnp.ndarray) -> jnp.ndarray:
    """Densify (V, C) features to (D, H, W, C) (spconv `.dense()` at the
    encoder output). Gather-based: for every dense cell, binary-search the
    sorted active set — a scatter here would serialize on TPU."""
    d, h, w = grid.shape
    v, c = features.shape
    lin = grid.linear_ids
    cells = jnp.arange(d * h * w, dtype=jnp.int32)
    # dense cells are a superset of the keys, so span <= block: exact
    pos, hit = sorted_lookup(lin, cells, window=256)
    dense = jnp.where(
        hit[:, None], features[jnp.minimum(pos, v - 1)], 0.0)
    return dense.reshape(d, h, w, c)
