"""Pillar-dense sparse-tensor machinery: sparse in BEV, dense along z.

The TPU-native layout for the 3D sparse encoder: the z-axis is only 41 cells
(sparse_shape [41, 1440, 1440], coop config:245), so each active BEV pillar
stores a dense (Z, C) tile. Compared to per-voxel sparsity this

  - shrinks neighbor searches ~12x (one per pillar x 9 BEV offsets instead
    of per voxel x 27),
  - turns feature gathers into large contiguous (Z*C)-byte rows,
  - turns the conv itself into dense z-shifted matmuls on the MXU,

while computing the *same function*: occupancy masks preserve spconv's
submanifold/strided output-site semantics exactly (parity-tested against the
gather encoder).

A PillarTensor is (coords (P, 2) int32 (y, x) sorted by y*W+x, mask (P,),
occ (P, Z) bool, features (P, Z, C)); padding rows at the end.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cmtcoop_tpu.ops.sparse_utils import (INT32_MAX, guarded_lookup,
                                          sorted_lookup)


class PillarGrid(NamedTuple):
    coords: jnp.ndarray  # (P, 2) int32 (y, x); -1 padding
    mask: jnp.ndarray    # (P,)
    hw: Tuple[int, int]  # static BEV (H, W)
    z: int               # static dense z extent

    @property
    def linear_ids(self) -> jnp.ndarray:
        lin = self.coords[:, 0] * self.hw[1] + self.coords[:, 1]
        return jnp.where(self.mask, lin, INT32_MAX)


def build_pillars(
    voxel_coords: jnp.ndarray,  # (V, 3) int32 (z, y, x), any order
    voxel_mask: jnp.ndarray,
    voxel_feats: jnp.ndarray,   # (V, C)
    grid_hw: Tuple[int, int],
    z_extent: int,
    max_pillars: int,
):
    """Voxel set -> (pillar_coords (P, 2), pillar_mask (P,), occ (P, Z),
    feats (P, Z, C)) — plain arrays so the builder vmaps over the batch.

    Sort voxels pillar-major ((y, x) then z), segment into pillars, and fill
    each pillar's dense z-tile by the scatter-free run-start trick (dense
    (pillar, z) slots are a superset of the voxels, so the windowed merge is
    exact)."""
    h, w = grid_hw
    v = voxel_coords.shape[0]
    # int32 is sufficient: (H*W)*Z <= 1440*1440*41 ~ 85M < 2^31
    key = (voxel_coords[:, 1] * w + voxel_coords[:, 2]) * z_extent + \
        voxel_coords[:, 0]
    key = jnp.where(voxel_mask, key, INT32_MAX)
    order = jnp.argsort(key)
    skey = key[order]
    sfeat = voxel_feats[order]
    scoords = voxel_coords[order]
    svalid = voxel_mask[order]

    # rank-lookup window bound by construction (block 32 * <= z_extent
    # duplicates per pillar rank must fit the 2048 window)
    assert z_extent <= 64, z_extent
    pil_lin = jnp.where(svalid, skey // z_extent, INT32_MAX)
    head = jnp.concatenate(
        [jnp.ones((1,), bool), pil_lin[1:] != pil_lin[:-1]]) & svalid
    rank = jnp.cumsum(head.astype(jnp.int32)) - 1
    n_pillars = jnp.maximum(jnp.max(jnp.where(head, rank, -1)) + 1, 0)

    slots = jnp.arange(max_pillars, dtype=jnp.int32)
    rank_sentinel = jnp.where(svalid, rank, INT32_MAX)
    # duplicate keys per rank (up to z_extent voxels per pillar) -> window
    # must cover block * z_extent
    starts, _ = sorted_lookup(rank_sentinel, slots, block=32, window=2048)
    pmask = slots < n_pillars
    first = jnp.minimum(starts, v - 1)
    pcoords = jnp.where(
        pmask[:, None], scoords[first][:, 1:], -1).astype(jnp.int32)

    # dense (pillar, z) slot fill: slot key = rank*Z + z; voxel keys =
    # rank*Z + voxel_z (sorted); slots are the dense superset -> exact
    vox_slot_key = rank * z_extent + scoords[:, 0]
    vox_slot_key = jnp.where(svalid, vox_slot_key, INT32_MAX)
    slot_q = jnp.arange(max_pillars * z_extent, dtype=jnp.int32)
    pos, hit = sorted_lookup(vox_slot_key, slot_q, window=256, exact=None)
    feats = jnp.where(
        hit[:, None], sfeat[jnp.minimum(pos, v - 1)], 0.0)
    feats = feats.reshape(max_pillars, z_extent, -1)
    occ = hit.reshape(max_pillars, z_extent) & pmask[:, None]
    feats = feats * occ[..., None]
    return pcoords, pmask, occ, feats


def pillar_neighbor_map(grid: PillarGrid,
                        ky: int = 3, kx: int = 3,
                        exact=None) -> jnp.ndarray:
    """(P, ky*kx) gather map of BEV neighbor pillars (misses -> P).

    3x3 fast path: row-major sorted linear ids make the same-row taps pure
    adjacency (the cell (y, x-1), if occupied, sits at sorted index q-1 —
    nothing can sort between), and each dy row's three taps are consecutive
    linear ids, resolved by ONE run-3 windowed lookup. 2 lookup passes + 3
    shift-compares instead of 9 lookup passes."""
    p = grid.coords.shape[0]
    h, w = grid.hw
    lin = grid.linear_ids
    if ky != 3 or kx != 3:
        oy, ox = jnp.meshgrid(jnp.arange(ky) - ky // 2,
                              jnp.arange(kx) - kx // 2, indexing="ij")
        offs = jnp.stack(
            [oy.reshape(-1), ox.reshape(-1)], -1).astype(jnp.int32)
        nbr = grid.coords[:, None, :] + offs[None]
        valid = ((nbr[..., 0] >= 0) & (nbr[..., 0] < h) &
                 (nbr[..., 1] >= 0) & (nbr[..., 1] < w) &
                 grid.mask[:, None])
        qlin = nbr[..., 0] * w + nbr[..., 1]
        qlin = jnp.where(grid.mask[:, None], qlin, INT32_MAX)

        pos_t, hit_t = guarded_lookup(lin, jnp.swapaxes(qlin, 0, 1),
                                      exact=exact)
        pos = jnp.swapaxes(pos_t, 0, 1)
        hit = jnp.swapaxes(hit_t, 0, 1) & valid
        return jnp.where(hit, jnp.minimum(pos, p - 1), p)

    y = grid.coords[:, 0]
    x = grid.coords[:, 1]
    idx = jnp.arange(p, dtype=jnp.int32)
    m = grid.mask

    # same-row taps by adjacency (x bounds exclude row-wrap false matches)
    lin_prev = jnp.concatenate(
        [jnp.full((1,), INT32_MAX, jnp.int32), lin[:-1]])
    lin_next = jnp.concatenate(
        [lin[1:], jnp.full((1,), INT32_MAX, jnp.int32)])
    adj_l = m & (x > 0) & (lin_prev == lin - 1)
    adj_r = m & (x < w - 1) & (lin_next == lin + 1)
    col_l = jnp.where(adj_l, idx - 1, p)
    col_c = jnp.where(m, idx, p)
    col_r = jnp.where(adj_r, idx + 1, p)

    def dy_cols(dy):
        base = jnp.where(m, lin + dy * w - 1, INT32_MAX)
        # block 512: the windowed lookup is DMA-latency bound in its
        # per-block window slices, so fewer/larger blocks win (0.417 ->
        # 0.212 ms at L0, tools/probe_lookup.py). Window scales with the
        # block (span <= block + row spread, measured spread p100 ~50);
        # the overflow guard falls back to exact on violation.
        pos, hit, ovf = sorted_lookup(
            lin, base, run=3, block=512, window=640,
            return_overflow=True, exact=exact)
        yv = (y + dy >= 0) & (y + dy < h) & m
        cols = []
        for d, dx in enumerate((-1, 0, 1)):
            ok = hit[:, d] & yv & (x + dx >= 0) & (x + dx < w)
            cols.append(jnp.where(ok, jnp.minimum(pos[:, d], p - 1), p))
        return cols, ovf

    if exact or (exact is None and jax.default_backend() == "cpu"):
        up, _ = dy_cols(-1)
        dn, _ = dy_cols(1)
        return jnp.stack(up + [col_l, col_c, col_r] + dn, axis=1)

    up, ovf_u = dy_cols(-1)
    dn, ovf_d = dy_cols(1)
    fast = jnp.stack(up + [col_l, col_c, col_r] + dn, axis=1)

    def exact_all(_):
        return pillar_neighbor_map(grid, ky, kx, exact=True)

    # windowed result is biased-to-miss on overflow: recompute exactly
    # (lax.cond — callers batch with lax.map, never vmap)
    return jax.lax.cond(ovf_u | ovf_d, exact_all, lambda _: fast, None)


def pillar_downsample_grid(grid: PillarGrid, max_out: int,
                           stride: int = 2, k: int = 3,
                           pad: int = 1, return_n: bool = False):
    """BEV output pillar set of a strided conv (2D version of
    sparse_utils.downsample_output_grid).

    `return_n=True` also returns the TRUE unique-cell count (before the
    `max_out` cap) so callers can detect silent truncation — a k=3/s=2
    conv DILATES occupancy (~1.2x at realistic lidar densities), so
    mid-level caps must be sized ABOVE the previous level's, not below
    (the r3 bench originally shipped descending caps and dropped ~28%
    of L1-L3 pillars without any telemetry)."""
    h, w = grid.hw
    out_h = (h + 2 * pad - k) // stride + 1
    out_w = (w + 2 * pad - k) // stride + 1
    cands, valids = [], []
    for a in range(2):
        c = grid.coords[:, a]
        lo = -((-(c + pad - k + 1)) // stride)
        hi = (c + pad) // stride
        n_cand = (k + stride - 1) // stride
        o = lo[:, None] + jnp.arange(n_cand, dtype=jnp.int32)[None]
        bound = out_h if a == 0 else out_w
        ok = (o <= hi[:, None]) & (o >= 0) & (o < bound)
        cands.append(o)
        valids.append(ok)
    p = grid.coords.shape[0]
    ny, nx = cands[0].shape[1], cands[1].shape[1]
    oy = jnp.broadcast_to(cands[0][:, :, None], (p, ny, nx))
    ox = jnp.broadcast_to(cands[1][:, None, :], (p, ny, nx))
    ok = (jnp.broadcast_to(valids[0][:, :, None], (p, ny, nx)) &
          jnp.broadcast_to(valids[1][:, None, :], (p, ny, nx)) &
          grid.mask[:, None, None])
    lin = jnp.where(ok, oy * out_w + ox, INT32_MAX).reshape(-1)
    slin = jnp.sort(lin)
    head = jnp.concatenate([jnp.ones((1,), bool), slin[1:] != slin[:-1]])
    head &= slin != INT32_MAX
    rank = jnp.cumsum(head.astype(jnp.int32)) - 1
    rank = jnp.where(slin == INT32_MAX, INT32_MAX, rank)
    n_uniq = jnp.maximum(
        jnp.max(jnp.where(rank == INT32_MAX, -1, rank)) + 1, 0)
    slots = jnp.arange(max_out, dtype=jnp.int32)
    # hard window bound: <= k*k inputs nominate one output cell, so a
    # 512-slot block spans <= 512*9 duplicate ranks; real clouds average
    # ~1.2 nominations/cell, so try a 2048 window first and retry at the
    # bound only on overflow. Block 512: the window slices are
    # DMA-latency bound (tools/probe_lookup.py), so fewer bigger blocks
    # win even with the wider window's extra compare-counts.
    pos, _, ovf = sorted_lookup(rank, slots, block=512, window=2048,
                                return_overflow=True)
    pos = jax.lax.cond(
        ovf,
        lambda _: sorted_lookup(rank, slots, block=512, window=4736)[0],
        lambda _: pos, None)
    uniq = slin[jnp.minimum(pos, slin.shape[0] - 1)]
    out_mask = slots < n_uniq
    coords = jnp.where(
        out_mask[:, None],
        jnp.stack([uniq // out_w, uniq % out_w], -1), -1).astype(jnp.int32)
    out = PillarGrid(coords, out_mask, (out_h, out_w), grid.z)
    return (out, n_uniq) if return_n else out


def pillar_conv_neighbor_map(in_grid: PillarGrid, out_grid: PillarGrid,
                             stride: int = 2, k: int = 3,
                             pad: int = 1, exact=None,
                             window: int = 512) -> jnp.ndarray:
    """(P_out, k*k) gather map into input pillars for a strided BEV conv.

    k=3 fast path: each kernel row's k input cells are consecutive linear
    ids -> one run-3 windowed lookup per dy (3 passes instead of 9).
    `window` sizes the lookup slice per 128-query block (cost is linear in
    it); measured p100 spans by level: ~225 / ~400 / ~490 — overflow falls
    back to the exact path, so tight windows are safe."""
    p_in = in_grid.coords.shape[0]
    h, w = in_grid.hw
    lin = in_grid.linear_ids
    if k != 3:
        oy, ox = jnp.meshgrid(jnp.arange(k), jnp.arange(k), indexing="ij")
        offs = jnp.stack(
            [oy.reshape(-1), ox.reshape(-1)], -1).astype(jnp.int32)
        src = out_grid.coords[:, None, :] * stride + offs[None] - pad
        valid = ((src[..., 0] >= 0) & (src[..., 0] < h) &
                 (src[..., 1] >= 0) & (src[..., 1] < w) &
                 out_grid.mask[:, None])
        qlin = src[..., 0] * w + src[..., 1]
        qlin = jnp.where(out_grid.mask[:, None], qlin, INT32_MAX)
        pos_t, hit_t = guarded_lookup(lin, jnp.swapaxes(qlin, 0, 1),
                                      window=1024, exact=exact)
        pos = jnp.swapaxes(pos_t, 0, 1)
        hit = jnp.swapaxes(hit_t, 0, 1) & valid
        return jnp.where(hit, jnp.minimum(pos, p_in - 1), p_in)

    oy = out_grid.coords[:, 0]
    ox = out_grid.coords[:, 1]
    om = out_grid.mask

    def dy_cols(dy):
        sy = oy * stride + dy - pad
        sx0 = ox * stride - pad
        base = jnp.where(om, sy * w + sx0, INT32_MAX)
        pos, hit, ovf = sorted_lookup(
            lin, base, run=3, window=window, return_overflow=True,
            exact=exact)
        yv = (sy >= 0) & (sy < h) & om
        cols = []
        for d in range(3):
            ok = hit[:, d] & yv & (sx0 + d >= 0) & (sx0 + d < w)
            cols.append(jnp.where(ok, jnp.minimum(pos[:, d], p_in - 1),
                                  p_in))
        return cols, ovf

    if exact or (exact is None and jax.default_backend() == "cpu"):
        cols = []
        for dy in range(3):
            c, _ = dy_cols(dy)
            cols += c
        return jnp.stack(cols, axis=1)

    cols, ovfs = [], []
    for dy in range(3):
        c, o = dy_cols(dy)
        cols += c
        ovfs.append(o)
    fast = jnp.stack(cols, axis=1)

    def exact_all(_):
        return pillar_conv_neighbor_map(in_grid, out_grid, stride, k, pad,
                                        exact=True)

    return jax.lax.cond(
        ovfs[0] | ovfs[1] | ovfs[2], exact_all, lambda _: fast, None)


def pillar_conv(
    feats: jnp.ndarray,        # (P_in, Z_in, Cin)
    nbr: jnp.ndarray,          # (P_out, KB) BEV gather map (miss -> P_in)
    weights: jnp.ndarray,      # (K = kz*ky*kx, Cin, Cout), z-major layout
    kz: int, z_stride: int = 1, z_pad: int = 1,
    chunk: int = 8192,
    precision=None,
) -> jnp.ndarray:
    """Sparse-BEV x dense-z convolution.

    out[p, zo] = sum_{j in KB, dz in kz} feats[nbr[p, j], zo*s + dz - pad]
                 @ W[dz, j]

    Expressed as ONE dense `lax.conv` per pillar chunk: the gathered
    neighborhood (chunk, KB, Z+2p, C) convolves with a (KB, kz, C, Cout)
    kernel (VALID, fully covering KB) — the conv emitter does the im2col in
    VMEM so the MXU sees K = KB*kz*Cin instead of tiny per-tap contractions
    (a 27x utilization difference at C=16). Weight layout matches the gather
    encoder's (K, Cin, Cout), z-major, so parameters are interchangeable.
    """
    p_in, z_in, cin = feats.shape
    p_out, kb = nbr.shape
    cout = weights.shape[2]
    z_out = (z_in + 2 * z_pad - kz) // z_stride + 1
    # (K=kz*kb z-major, Cin, Cout) -> 1D conv kernel (kz, KB*Cin, Cout):
    # folding the BEV taps into the channel dim makes the contraction
    # K = KB*kz*Cin (432 at C=16) instead of C — full MXU tiles.
    w3 = weights.reshape(kz, kb * cin, cout).astype(feats.dtype)

    padded = jnp.concatenate(
        [feats, jnp.zeros((1, z_in, cin), feats.dtype)], axis=0)
    if z_pad:
        zp = jnp.zeros((p_in + 1, z_pad, cin), feats.dtype)
        padded = jnp.concatenate([zp, padded, zp], axis=1)

    def conv_chunk(nbr_c):
        tiles = padded[nbr_c]  # (chunk, KB, Z+2p, Cin), contiguous rows
        x = tiles.transpose(0, 2, 1, 3).reshape(
            nbr_c.shape[0], z_in + 2 * z_pad, kb * cin)
        # sub-f32 inputs upcast around the conv: forward numerics are
        # IDENTICAL to the bf16-operand/preferred-f32 conv (bf16->f32 is
        # exact, accumulation f32 either way), and the backward stays
        # well-typed — conv's transpose rule feeds the f32 cotangent and
        # the kernel into one conv, which rejects mixed dtypes (hit by
        # the bf16 train step, tools/probe_train_step.py)
        cdt = jnp.promote_types(feats.dtype, jnp.float32)
        out = jax.lax.conv_general_dilated(
            x.astype(cdt), w3.astype(cdt),
            window_strides=(z_stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
            precision=precision)
        return out.astype(feats.dtype)  # (chunk, Z_out, Cout)

    if p_out <= chunk:
        return conv_chunk(nbr)
    # pad the gather map to a chunk multiple with miss rows (index p_in
    # -> the appended zero row): the lax.map loop then bounds the live
    # im2col transient to ONE chunk's tiles. Without it a non-divisible
    # cap fell back to a single whole-cap gather — (38400, 9, 43, 16)
    # tiles at 4.2x layout padding were the allocations that pushed the
    # flagship train step 78 MB over HBM (runs/tpu_probe.log r5).
    p_pad = -(-p_out // chunk) * chunk
    nbr_p = jnp.pad(nbr, ((0, p_pad - p_out), (0, 0)),
                    constant_values=p_in)
    out = jax.lax.map(conv_chunk, nbr_p.reshape(-1, chunk, kb))
    return out.reshape(p_pad, z_out, cout)[:p_out]


def occ_downsample(occ: jnp.ndarray, nbr: jnp.ndarray,
                   kz: int, z_stride: int, z_pad: int) -> jnp.ndarray:
    """Output occupancy = any input voxel in the receptive field (spconv
    SparseConv3d site rule), computed as a maxpool through the same gather
    map."""
    p_in, z_in = occ.shape
    z_out = (z_in + 2 * z_pad - kz) // z_stride + 1
    padded = jnp.concatenate(
        [occ, jnp.zeros((1, z_in), bool)], axis=0)
    if z_pad:
        zp = jnp.zeros((p_in + 1, z_pad), bool)
        padded = jnp.concatenate([zp, padded, zp], axis=1)
    tiles = padded[nbr]  # (P_out, KB, Z+2p) — one gather, then one reduce
    any_bev = jnp.any(tiles, axis=1)
    cols = jnp.stack([
        jax.lax.slice_in_dim(
            any_bev, dz, dz + (z_out - 1) * z_stride + 1, z_stride, axis=1)
        for dz in range(kz)], axis=0)
    return jnp.any(cols, axis=0)


def pillars_to_dense(grid: PillarGrid, feats: jnp.ndarray) -> jnp.ndarray:
    """(P, Z, C) -> dense (H, W, Z*C) BEV map, gather-based."""
    h, w = grid.hw
    p, z, c = feats.shape
    lin = grid.linear_ids
    cells = jnp.arange(h * w, dtype=jnp.int32)
    # keys are a subset of the dense cells, so a 512-query block spans
    # <= 512 keys; big blocks amortize the per-block window DMA latency
    pos, hit = sorted_lookup(lin, cells, block=512, window=640)
    rows = feats.reshape(p, z * c)
    dense = jnp.where(hit[:, None], rows[jnp.minimum(pos, p - 1)], 0.0)
    return dense.reshape(h, w, z * c)


def pillarize(
    points: jnp.ndarray,       # (N, F) padded, xyz first
    point_mask: jnp.ndarray,   # (N,)
    *,
    voxel_size,
    pc_range,
    grid_size,                 # (X, Y, Z) cells
    max_points: int = 10,
    max_voxels: int = 120000,
    max_pillars: int = 40000,
    win: int = 128,
    return_stats: bool = False,
):
    """points -> pillar-dense tensors in ONE sort (replaces
    voxelize + HardSimpleVFE + build_pillars for the pillar encoder path).

    The round-1 three-step path cost ~42 ms/agent, dominated by tiny-row
    gathers: the (V, 10, F) voxel fill and the 2M-slot dense fill. Here the
    capped per-voxel means land directly in (P, Z, F) slots via one
    per-pillar windowed one-hot einsum (contiguous 128-point windows, MXU
    contraction) — no per-slot gathers at all. Semantics match the
    reference exactly: hard-voxelize keeps the first `max_points` points
    per voxel in original order (stable sort), voxels past `max_voxels`
    and pillars past `max_pillars` are dropped in sorted order.

    Returns (pcoords (P,2) int32 (y,x), pmask (P,), occ (P, Z) bool,
    feats (P, Z, F) float32). Z = grid_z + 1 (spconv sparse_shape).

    With `return_stats=True` a fifth element is returned: a dict of
    scalar int32 drop telemetry — `n_voxels_raw` / `n_pillars_raw`
    (occupancy BEFORE the caps), `n_voxels_dropped` / `n_pillars_dropped`
    (how many the caps cut; nonzero means the caps truncate this cloud
    and downstream outputs are not exact), and `n_points_in_range` /
    `n_points_dropped` (points lost to any cap, incl. max_points).
    """
    from cmtcoop_tpu.ops.voxelize import compute_voxel_coords

    n, f = points.shape
    zyx, valid = compute_voxel_coords(
        points, point_mask, voxel_size, pc_range, grid_size)
    gx, gy, gz = grid_size
    z_extent = gz + 1
    key = (zyx[:, 1] * gx + zyx[:, 2]) * z_extent + zyx[:, 0]
    key = jnp.where(valid, key, INT32_MAX)

    order = jnp.argsort(key)   # stable: ties keep original point order
    skey = key[order]
    spts = points[order].astype(jnp.float32)

    bound = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    head = bound & (skey != INT32_MAX)
    vrank = jnp.cumsum(head.astype(jnp.int32)) - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(bound, idx, -1))
    pos_in_run = idx - run_start
    # validity for SEGMENTATION: the max_points cap must not fragment
    # voxel/pillar runs — it only excludes points from the sums below.
    # Both cap masks are suffixes in sorted order, so runs stay contiguous.
    valid_pt = (skey != INT32_MAX) & (vrank < max_voxels)

    pil = jnp.where(valid_pt, skey // z_extent, INT32_MAX)
    phead = jnp.concatenate(
        [jnp.ones((1,), bool), pil[1:] != pil[:-1]]) & (pil != INT32_MAX)
    prank = jnp.cumsum(phead.astype(jnp.int32)) - 1
    n_pillars = jnp.maximum(
        jnp.max(jnp.where(phead, prank, -1)) + 1, 0)
    n_pillars = jnp.minimum(n_pillars, max_pillars)
    ok = valid_pt & (pos_in_run < max_points) & (prank < max_pillars)

    # pillar head positions, scatter-free: prank is non-decreasing over the
    # sorted points, so the first point of pillar r is the left insertion
    # point of r — one windowed rank lookup instead of a second full
    # argsort (the round-1 implementation; ~2 ms/agent on TPU). Misses
    # (r >= n_pillars) resolve to the tail position, which doubles as the
    # extent bound of the LAST retained pillar for the overflow check.
    # Duplicates per rank = raw points per pillar (unbounded), so overflow
    # falls back to the argsort path.
    rank_keys = jnp.where(pil != INT32_MAX, prank, INT32_MAX)
    slots = jnp.arange(max_pillars, dtype=jnp.int32)
    pos_r, _, ovf_r = sorted_lookup(
        rank_keys, slots, window=2048, return_overflow=True)
    # tail = first point of the first DROPPED pillar (beyond-cap points
    # must not count toward the last block's extent, or the fast/slow
    # check below false-fires on any capped cloud — 104 ms slow path)
    n_keep = jnp.sum(
        ((pil != INT32_MAX) & (prank < max_pillars)).astype(jnp.int32))

    def pstart_lookup(_):
        return jnp.minimum(pos_r, n).astype(jnp.int32), n_keep

    def pstart_argsort(_):
        pil_ext = jnp.concatenate(
            [pil, jnp.full((1,), INT32_MAX, jnp.int32)])
        tailhead = jnp.concatenate(
            [pil_ext[:1] == INT32_MAX,
             (pil_ext[1:] == INT32_MAX) & (pil_ext[:-1] != INT32_MAX)])
        phead_ext = jnp.concatenate([phead, jnp.zeros((1,), bool)])
        heads_pos = jnp.argsort(~(phead_ext | tailhead)).astype(jnp.int32)
        if heads_pos.shape[0] < max_pillars + 1:
            heads_pos = jnp.concatenate(
                [heads_pos,
                 jnp.full((max_pillars + 1 - heads_pos.shape[0],), n,
                          jnp.int32)])
        return heads_pos[:max_pillars], heads_pos[max_pillars]

    pstart, tail_pos = jax.lax.cond(
        ovf_r, pstart_argsort, pstart_lookup, None)
    pmask = jnp.arange(max_pillars, dtype=jnp.int32) < n_pillars
    plin = jnp.where(pmask, skey[jnp.minimum(pstart, n - 1)] // z_extent, -1)
    pcoords = jnp.where(
        pmask[:, None],
        jnp.stack([plin // gx, plin % gx], axis=-1), -1).astype(jnp.int32)

    slot_of_point = jnp.where(ok, prank * z_extent + skey % z_extent,
                              INT32_MAX)

    def fast(_):
        # Expand every point to a sparse z-placed row (VPU, fused):
        # e[w, z*(F+1)+c] = pts_aug[w, c] iff z(w) == z, where pts_aug
        # carries a trailing 1 so sums and counts come out of ONE matmul.
        # Then per 128-pillar block: one-hot pillar matching as a proper
        # (128, bwin) @ (bwin, Z*(F+1)) MXU matmul over the block's
        # contiguous point window. (A per-pillar einsum with N=F is
        # batch-49k of tiny matmuls — measured 12x slower.)
        # block size clamps to the cap so tiny configs (max_pillars <
        # 128, e.g. the dryrun's 64-pillar encoder) keep nb >= 1
        bp = min(128, max_pillars)
        bwin = 4 * win
        nb = max_pillars // bp
        zoh = ((skey % z_extent)[:, None] ==
               jnp.arange(z_extent, dtype=jnp.int32)[None, :]) & ok[:, None]
        pts_aug = jnp.concatenate(
            [spts, jnp.ones((n, 1), jnp.float32)], axis=1)
        e = (zoh.astype(jnp.float32)[:, :, None] *
             pts_aug[:, None, :]).reshape(n, z_extent * (f + 1))
        e = jnp.concatenate(
            [e, jnp.zeros((bwin, e.shape[1]), jnp.float32)])
        prank_pad = jnp.concatenate(
            [jnp.where(ok, prank, INT32_MAX),
             jnp.full((bwin,), INT32_MAX, jnp.int32)])
        bstart = jnp.minimum(pstart[::bp], max(n - bwin, 0))
        win_e = jax.vmap(
            lambda s: jax.lax.dynamic_slice(e, (s, 0), (bwin, e.shape[1]))
        )(bstart)                                    # (nb, bwin, Z*(F+1))
        win_rank = jax.vmap(
            lambda s: jax.lax.dynamic_slice(prank_pad, (s,), (bwin,))
        )(bstart)                                    # (nb, bwin)
        pids = (jnp.arange(nb, dtype=jnp.int32)[:, None] * bp +
                jnp.arange(bp, dtype=jnp.int32)[None, :])
        ohp = (win_rank[:, None, :] == pids[:, :, None]).astype(
            jnp.float32)                             # (nb, bp, bwin)
        out = jnp.einsum("bqw,bwc->bqc", ohp, win_e)
        out = out.reshape(max_pillars, z_extent, f + 1)
        return out[..., :f], out[..., f]

    def slow(_):
        # exact fallback for pillars with > win raw points: compact the
        # CAPPED points first (argsort(~keep) is stable, so kept points
        # stay in sorted slot order), then a wider window. Bounded by
        # construction: <= z_extent * max_points capped points per pillar,
        # so the wide window never overflows. No scatters, and the same
        # einsum pattern as `fast` (keeps XLA compile cheap).
        wide = (z_extent * max_points + 127) // 128 * 128
        kept_idx = jnp.argsort(~ok).astype(jnp.int32)
        spts_c = spts[kept_idx]
        slot_c = jnp.where(ok[kept_idx], slot_of_point[kept_idx],
                           INT32_MAX)
        kept_rank = jnp.cumsum(ok[kept_idx].astype(jnp.int32)) - 1
        # pillar start within the compacted array = number of kept points
        # before it: prefix count at pstart
        kept_before = jnp.cumsum(ok.astype(jnp.int32))
        pstart_c = jnp.where(
            pstart < n, kept_before[jnp.minimum(pstart, n - 1)] -
            ok[jnp.minimum(pstart, n - 1)].astype(jnp.int32),
            n).astype(jnp.int32)
        del kept_rank
        starts = jnp.minimum(pstart_c, max(n - wide, 0))
        spts_pad = jnp.concatenate(
            [spts_c, jnp.zeros((wide, f), jnp.float32)])
        slot_pad = jnp.concatenate(
            [slot_c, jnp.full((wide,), INT32_MAX, jnp.int32)])
        win_pts = jax.vmap(
            lambda s: jax.lax.dynamic_slice(spts_pad, (s, 0), (wide, f))
        )(starts)
        win_slot = jax.vmap(
            lambda s: jax.lax.dynamic_slice(slot_pad, (s,), (wide,))
        )(starts)
        slot_ids = (jnp.arange(max_pillars, dtype=jnp.int32)[:, None] *
                    z_extent +
                    jnp.arange(z_extent, dtype=jnp.int32)[None, :])
        oh = (win_slot[:, None, :] == slot_ids[:, :, None])
        ohf = oh.astype(jnp.float32)
        sums = jnp.einsum("pqw,pwf->pqf", ohf, win_pts)
        counts = jnp.sum(ohf, axis=-1)
        return sums, counts

    # fast-path invariant: every 128-pillar block's points fit its 4*win
    # window (block boundaries measured to the next real head / the tail
    # marker, so the dropped beyond-cap tail never false-positives)
    bnext = jnp.concatenate(
        [pstart[128::128], tail_pos[None]])
    overflow = jnp.any(bnext - pstart[::128] > 4 * win)
    sums, counts = jax.lax.cond(overflow, slow, fast, None)
    occ = (counts > 0) & pmask[:, None]
    feats = jnp.where(
        occ[..., None], sums / jnp.maximum(counts, 1.0)[..., None], 0.0)
    if not return_stats:
        return pcoords, pmask, occ, feats
    # drop telemetry (all pre-cap quantities are already available in
    # sorted order: `head` marks every in-range voxel head, raw pillar
    # heads are boundaries of skey//z_extent)
    in_range = skey != INT32_MAX
    n_voxels_raw = jnp.sum(head.astype(jnp.int32))
    pil_raw = jnp.where(in_range, skey // z_extent, INT32_MAX)
    praw_head = jnp.concatenate(
        [jnp.ones((1,), bool),
         pil_raw[1:] != pil_raw[:-1]]) & (pil_raw != INT32_MAX)
    n_pillars_raw = jnp.sum(praw_head.astype(jnp.int32))
    n_in = jnp.sum(in_range.astype(jnp.int32))
    stats = dict(
        n_voxels_raw=n_voxels_raw,
        n_voxels_dropped=jnp.maximum(n_voxels_raw - max_voxels, 0),
        n_pillars_raw=n_pillars_raw,
        n_pillars_dropped=jnp.maximum(n_pillars_raw - max_pillars, 0),
        n_points_in_range=n_in,
        n_points_dropped=n_in - jnp.sum(ok.astype(jnp.int32)),
    )
    return pcoords, pmask, occ, feats, stats
