"""Fused Pallas kernel for the sparse-BEV x dense-z pillar convolution.

The round-1 implementation (`ops.pillars.pillar_conv`) materializes the
gathered (P, KB, Z+2p, C) neighborhood, a transposed copy, and the conv
read — ~2.4 GB of HBM traffic per stage-0 conv (measured 150 GB/s, 19.6 ms).
This kernel keeps everything in VMEM (measured 2.4x faster at stage-0):

  per output block of BP pillars:
    1. DMA a contiguous `win`-row window of input pillar rows HBM->VMEM
       (double-buffered across grid steps). Windows work because pillars are
       sorted by BEV linear id: all KB neighbor taps of BP consecutive
       pillars span a few hundred rows (measured p99=376 for BP=128 on a
       realistic cloud).
    2. Resolve each tap with a one-hot matmul on the MXU (in-VMEM row
       gather: Mosaic has no vector gather, but (BP, win) @ (win, Z*C) at
       bf16 is cheap and exact — one-hot rows select rows).
    3. Contract z and channels in one matmul per tap with a precomputed
       *band matrix* B[j] (Z_in*C, Z_out*Cout): B[j][zi*C+ci, zo*Cout+co] =
       W[zi-(zo*s - pad), j, ci, co] inside the kernel z-window, else 0.
    4. Fused epilogue: +BN bias (scale folded into B), +residual, ReLU,
       x occupancy mask — the whole PillarConvBlock in one kernel.

Exactness guard: if any valid tap falls outside its block window (extreme
density transitions), a `lax.cond` falls back to the reference XLA path —
never silently wrong. Replaces spconv's gather/scatter+implicit-GEMM CUDA
kernels (reference: mmdet3d SparseEncoder, coop config pts_middle_encoder).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmtcoop_tpu.ops import pillars as pu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def band_matrix(weights: jnp.ndarray, z_in: int, z_out: int,
                kz: int, z_stride: int, z_pad: int,
                scale: Optional[jnp.ndarray] = None,
                dtype=jnp.bfloat16) -> jnp.ndarray:
    """(K, Cin, Cout) z-major conv weights -> (KB, Z_in*Cin, Z_out*Cout)
    band matrices; optional per-Cout scale folded in (BN eval)."""
    k, cin, cout = weights.shape
    kb = k // kz
    w4 = weights.reshape(kz, kb, cin, cout).astype(jnp.float32)
    if scale is not None:
        w4 = w4 * scale.astype(jnp.float32)[None, None, None, :]
    zi = jnp.arange(z_in)
    zo = jnp.arange(z_out)
    # input z `zi` feeds output z `zo` at kernel tap dz iff
    # zi + z_pad == zo * z_stride + dz
    ind = (zi[None, :, None] + z_pad ==
           zo[None, None, :] * z_stride +
           jnp.arange(kz)[:, None, None]).astype(jnp.float32)
    b = jnp.einsum("dpq,djio->jpiqo", ind, w4)
    return b.reshape(kb, z_in * cin, z_out * cout).astype(dtype)


def _tile_plan(z_in, z_out, cin, cout, kz, z_stride, z_pad):
    """Static z-tiling of the band contraction. The full band matrix is
    (Z_in*Cin, Z_out*Cout) but only a kz/Z_in-wide diagonal band is nonzero
    — at stage 0 (z=41, kz=3) a dense contraction does ~14x the needed
    FLOPs. Tiles of T output z-slices each read a fixed (T-1)*s+kz input
    window; T sized so the matmul stays MXU-friendly (>=16 rows of lanes).

    Returns (T, Tin, starts) or None when tiling wouldn't help."""
    t = max(1, -(-256 // cout))  # ceil(256 / cout) output z per tile
    t = min(t, z_out)
    ntiles = -(-z_out // t)
    tin = (t - 1) * z_stride + kz
    if ntiles <= 1 or tin >= z_in:
        return None
    starts = [min(max(i * t * z_stride - z_pad, 0), z_in - tin)
              for i in range(ntiles)]
    return t, tin, starts


def _fused_kernel(starts_ref, nbrl_ref, *rest, win, bp, kb, zoco,
                  has_bias, has_resid, has_occ, relu,
                  tiles=None, cin=None, cout=None):
    it = iter(rest)
    occ_ref = next(it) if has_occ else None
    resid_ref = next(it) if has_resid else None
    bias_ref = next(it) if has_bias else None
    e_ref = next(it) if has_occ else None
    rows_hbm = next(it)
    band_ref = next(it)
    o_ref = next(it)
    win_buf = next(it)
    sem = next(it)

    blk = pl.program_id(0)
    nblk = pl.num_programs(0)

    def dma(slot, b_idx):
        s = pl.multiple_of(starts_ref[b_idx], 8)
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(s, win), :], win_buf.at[slot], sem.at[slot])

    @pl.when(blk == 0)
    def _():
        dma(0, 0).start()

    @pl.when(blk + 1 < nblk)
    def _():
        dma((blk + 1) % 2, blk + 1).start()

    dma(blk % 2, blk).wait()
    window = win_buf[blk % 2]  # (win, ZCP)

    iota = jax.lax.broadcasted_iota(jnp.int32, (bp, win), 1)
    gs = []
    for j in range(kb):
        oh = (nbrl_ref[:, j][:, None] == iota).astype(window.dtype)
        gs.append(jax.lax.dot_general(
            oh, window, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(window.dtype))
    if tiles is None:
        acc = jnp.zeros((bp, zoco), jnp.float32)
        for j in range(kb):
            acc = acc + jax.lax.dot_general(
                gs[j], band_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    else:
        # z-tiled band: contract only the nonzero diagonal band, one
        # (bp, Tin*Cin) @ (Tin*Cin, T*Cout) matmul per tap per tile
        t, tin, tstarts = tiles
        cols = []
        for ti, s0 in enumerate(tstarts):
            a = jnp.zeros((bp, t * cout), jnp.float32)
            lo = s0 * cin
            for j in range(kb):
                a = a + jax.lax.dot_general(
                    gs[j][:, lo:lo + tin * cin], band_ref[j, ti],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            cols.append(a)
        acc = jnp.concatenate(cols, axis=1)[:, :zoco]

    if has_bias:
        acc = acc + bias_ref[0][None, :].astype(jnp.float32)
    if has_resid:
        acc = acc + resid_ref[...].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    if has_occ:
        occx = jax.lax.dot_general(
            occ_ref[...].astype(e_ref.dtype), e_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = acc * occx
    o_ref[...] = acc.astype(o_ref.dtype)


def _xla_reference(feats, nbr, weights, kz, z_stride, z_pad,
                   scale, bias, occ_out, residual, relu):
    """Unfused fallback — identical math via ops.pillars.pillar_conv."""
    out = pu.pillar_conv(
        feats, nbr, weights.astype(feats.dtype), kz, z_stride, z_pad
    ).astype(jnp.float32)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    if occ_out is not None:
        out = out * occ_out.astype(jnp.float32)[..., None]
    return out.astype(feats.dtype)


def fused_pillar_conv(
    feats: jnp.ndarray,            # (P_in, Z_in, Cin)
    nbr: jnp.ndarray,              # (P_out, KB) gather map, miss -> P_in
    weights: jnp.ndarray,          # (kz*KB, Cin, Cout) z-major
    *,
    kz: int = 3,
    z_stride: int = 1,
    z_pad: int = 1,
    scale: Optional[jnp.ndarray] = None,     # (Cout,) BN eval scale
    bias: Optional[jnp.ndarray] = None,      # (Cout,) BN eval bias
    occ_out: Optional[jnp.ndarray] = None,   # (P_out, Z_out) bool
    residual: Optional[jnp.ndarray] = None,  # (P_out, Z_out, Cout)
    relu: bool = False,
    bp: int = 128,
    win: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """conv (+BN eval) (+residual) (+ReLU) (+occupancy mask), one kernel.

    Returns (P_out, Z_out, Cout). Falls back to the XLA path when the
    window invariant does not hold (runtime `lax.cond`) or when shapes are
    unsupported (static).
    """
    p_in, z_in, cin = feats.shape
    p_out, kb = nbr.shape
    cout = weights.shape[2]
    z_out = (z_in + 2 * z_pad - kz) // z_stride + 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    unsupported = (p_out % bp != 0 or kb * kz != weights.shape[0]
                   or p_in < 8 or win % 8 != 0)
    if unsupported:
        return _xla_reference(feats, nbr, weights, kz, z_stride, z_pad,
                              scale, bias, occ_out, residual, relu)

    zc = z_in * cin
    zoco = z_out * cout
    zcp = _round_up(zc, 128)
    nb = p_out // bp

    rows = feats.reshape(p_in, zc)
    if zcp != zc:
        rows = jnp.pad(rows, ((0, 0), (0, zcp - zc)))
    if p_in < win:
        rows = jnp.pad(rows, ((0, win - p_in), (0, 0)))

    nblk = nbr.reshape(nb, bp, kb)
    valid = nblk < p_in
    start = jnp.min(jnp.where(valid, nblk, p_in), axis=(1, 2))
    start = (jnp.clip(start, 0, max(p_in - win, 0)) // 8 * 8).astype(
        jnp.int32)
    local = nblk - start[:, None, None]
    in_win = (local >= 0) & (local < win)
    overflow = jnp.any(valid & ~in_win)
    local = jnp.where(valid & in_win, local, win).astype(jnp.int32)

    band = band_matrix(weights, z_in, z_out, kz, z_stride, z_pad,
                       scale=scale, dtype=feats.dtype)
    tiles = _tile_plan(z_in, z_out, cin, cout, kz, z_stride, z_pad)
    if tiles is not None:
        t, tin, tstarts = tiles
        tiled_flops = len(tstarts) * tin * cin * t * cout
        if tiled_flops > 0.7 * zc * zoco:
            tiles = None  # banding too dense for tiling to pay off
    if tiles is None:
        if zcp != zc:
            band = jnp.pad(band, ((0, 0), (0, zcp - zc), (0, 0)))
    else:
        t, tin, tstarts = tiles
        tile_mats = []
        for ti, s0 in enumerate(tstarts):
            bt = band[:, s0 * cin:(s0 + tin) * cin,
                      ti * t * cout:min((ti + 1) * t, z_out) * cout]
            if bt.shape[2] < t * cout:  # ragged last tile
                bt = jnp.pad(bt, ((0, 0), (0, 0),
                                  (0, t * cout - bt.shape[2])))
            tile_mats.append(bt)
        band = jnp.stack(tile_mats, axis=1)  # (kb, ntiles, Tin*Cin, T*Cout)

    has_bias = bias is not None
    has_resid = residual is not None
    has_occ = occ_out is not None

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # starts
        pl.BlockSpec((bp, kb), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),                    # local idx
    ]
    operands = [start, local.reshape(nb * bp, kb)]
    if has_occ:
        in_specs.append(pl.BlockSpec((bp, z_out), lambda b: (b, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(occ_out.astype(feats.dtype))
    if has_resid:
        in_specs.append(pl.BlockSpec((bp, zoco), lambda b: (b, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(residual.reshape(p_out, zoco).astype(feats.dtype))
    if has_bias:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        bias_row = jnp.tile(bias.astype(jnp.float32), z_out)[None, :]
        operands.append(bias_row)
    if has_occ:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        e = jnp.repeat(jnp.eye(z_out, dtype=feats.dtype), cout, axis=1)
        operands.append(e)  # (Z_out, Z_out*Cout) occupancy expander
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),                        # rows
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # band
    ]
    operands += [rows, band]

    kernel = pl.pallas_call(
        functools.partial(
            _fused_kernel, win=win, bp=bp, kb=kb, zoco=zoco,
            has_bias=has_bias, has_resid=has_resid, has_occ=has_occ,
            relu=relu, tiles=tiles, cin=cin, cout=cout),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bp, zoco), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_out, zoco), feats.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, win, zcp), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )

    def fast(_):
        return kernel(*operands).reshape(p_out, z_out, cout)

    def slow(_):
        return _xla_reference(feats, nbr, weights, kz, z_stride, z_pad,
                              scale, bias, occ_out, residual, relu)

    return jax.lax.cond(overflow, slow, fast, None)
