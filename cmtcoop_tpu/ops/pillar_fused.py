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
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmtcoop_tpu.ops import pillars as pu

# K-packed tiled band contraction (taps stacked along K, one matmul per
# z-tile): measured ~8% SLOWER than per-tap matmuls at every stage (the
# kbuf assembly stores outweigh the removed K padding; runs/tpu_probe.log
# probe_pillar_kernel) — default off, kept for re-evaluation on future
# hardware. Env override: CMTCOOP_KPACK=1.
KPACK = os.environ.get("CMTCOOP_KPACK", "0") == "1"

# In-kernel ablation for probing ONLY (tools/probe_down_conv.py):
# "nogather" replaces the one-hot gathers with static window slices,
# "noband" replaces the band contraction with a VPU sum of the gathered
# taps (keeps them alive against DCE). Wrong results by design.
ABLATE = os.environ.get("CMTCOOP_ABLATE", "")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pin_rows_layout(x: jnp.ndarray, bp: int, interpret: bool):
    """Identity through a trivial Pallas kernel, used on the XLA-fallback
    branch of the retry-ladder conds. Why: XLA's layout assignment unifies
    a conditional's branch layouts without branch probabilities — the cold
    branch's concatenate/reshape chain made it pick COLUMN-major {0,1} for
    the (P, ZCP) packed rows, inserting a ~0.2 ms relayout copy after
    every conv on the HOT path (probe_trace: ~28 anonymous (40960, 768)
    {0,1}->{1,0} copies). Ending both branches in a pallas custom-call
    (fixed row-major layouts) makes the join {1,0}; the extra copy runs
    only if the fallback is ever taken."""
    p, w = x.shape
    if p % bp != 0 or p < bp:
        return x

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        k, grid=(p // bp,),
        in_specs=[pl.BlockSpec((bp, w), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bp, w), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, w), x.dtype),
        interpret=interpret,
    )(x)


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
    window; T sized for exactly one 128-lane MXU tile (T*Cout = 128) —
    measured 13% faster end-to-end than 256-lane tiles (narrower input
    band: Tin*Cin shrinks faster than the tile count grows).

    Returns (T, Tin, starts) or None when tiling wouldn't help."""
    lanes = int(os.environ.get("CMTCOOP_TILE_LANES", "128"))
    t = max(1, -(-lanes // cout))  # ceil(lanes / cout) output z per tile
    t = min(t, z_out)
    ntiles = -(-z_out // t)
    tin = (t - 1) * z_stride + kz
    if ntiles <= 1 or tin >= z_in:
        return None
    starts = [min(max(i * t * z_stride - z_pad, 0), z_in - tin)
              for i in range(ntiles)]
    return t, tin, starts


def band_plan(*, z_in: int, cin: int, cout: int, kz: int, z_stride: int,
              z_pad: int, kb: int, subm: bool, has_occ_out: bool,
              fold_occ: bool):
    """Static band-operand plan for `fused_pillar_conv`: the (zwin, tiles)
    decisions. Pure python of static shapes — callable at model-load time
    (the `prepare` path that hoists band matrices out of the per-frame
    jit) and inside the conv; both call THIS function so they cannot
    drift. Returns (zwin, tiles)."""
    z_out = (z_in + 2 * z_pad - kz) // z_stride + 1
    zwin = None
    # per-block z-windowed compute (subm only): see _fused_kernel_v2
    if (kb == 9 and subm and has_occ_out and not fold_occ
            and z_stride == 1 and z_out == z_in and z_in >= 16
            and cin in (16, 32, 64, 128) and cout in (16, 32, 64, 128)):
        zq = max(128 // cin, 128 // cout, 2)
        zwin_c = _round_up(z_in // 2 + 4, zq)
        zwin = zwin_c if zwin_c < z_in else None
    z_in_b, z_out_b = (zwin, zwin) if zwin else (z_in, z_out)
    tiles = _tile_plan(z_in_b, z_out_b, cin, cout, kz, z_stride, z_pad)
    if tiles is not None:
        t, tin, tstarts = tiles
        tiled_flops = len(tstarts) * tin * cin * t * cout
        if tiled_flops > 0.7 * (z_in_b * cin) * (z_out_b * cout):
            tiles = None  # banding too dense for tiling to pay off
    return zwin, tiles


def build_band(weights: jnp.ndarray, scale: Optional[jnp.ndarray], *,
               z_in: int, cin: int, cout: int, kz: int, z_stride: int,
               z_pad: int, zwin, tiles, zcp: int,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """The band operand of `fused_pillar_conv` in its final kernel layout
    (z-window-relative, z-tiled, K-padded to the packed row width), built
    from conv weights + folded BN scale. Frame-invariant: depends only on
    variables and static config, so it can be computed ONCE at load
    (`models.pillar_encoder.prepare_variables`) instead of per forward."""
    kb = weights.shape[0] // kz
    z_out = (z_in + 2 * z_pad - kz) // z_stride + 1
    z_in_b, z_out_b = (zwin, zwin) if zwin else (z_in, z_out)
    band = band_matrix(weights, z_in_b, z_out_b, kz, z_stride, z_pad,
                       scale=scale, dtype=dtype)
    if tiles is None:
        zc = z_in * cin
        if not zwin and zcp != zc:
            band = jnp.pad(band, ((0, 0), (0, zcp - zc), (0, 0)))
        return band
    t, tin, tstarts = tiles
    tile_mats = []
    for ti, s0 in enumerate(tstarts):
        bt = band[:, s0 * cin:(s0 + tin) * cin,
                  ti * t * cout:min((ti + 1) * t, z_out_b) * cout]
        if bt.shape[2] < t * cout:  # ragged last tile
            bt = jnp.pad(bt, ((0, 0), (0, 0),
                              (0, t * cout - bt.shape[2])))
        tile_mats.append(bt)
    if kb == 9 and KPACK:
        # K-packed layout for the v2 kernel: taps stacked along K
        # (ntiles, KP, T*Cout), KP 128-padded with zero rows
        tcp = tin * cin
        kp = _round_up(kb * tcp, 128)
        packed = [jnp.pad(bt.reshape(kb * tcp, t * cout),
                          ((0, kp - kb * tcp), (0, 0)))
                  for bt in tile_mats]
        return jnp.stack(packed, axis=0)
    return jnp.stack(tile_mats, axis=1)  # (kb, nt, Tin*Cin, TCout)


def _fused_kernel(starts_ref, nbrl_ref, blkact_ref, *rest, win, bp, kb,
                  zoco, has_bias, has_resid, has_occ, relu,
                  tiles=None, cin=None, cout=None, emit_occ=False,
                  lead=False):
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

    act = blkact_ref[blk] != 0
    nxt = jnp.minimum(blk + 1, nblk - 1)
    nxt_act = (blk + 1 < nblk) & (blkact_ref[nxt] != 0)

    @pl.when((blk == 0) & act)
    def _():
        dma(0, 0).start()

    @pl.when(nxt_act)
    def _():
        dma((blk + 1) % 2, blk + 1).start()

    @pl.when(~act)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)

    @pl.when(act)
    def _():
        dma(blk % 2, blk).wait()
        window = win_buf[blk % 2]  # (win, ZCP)

        iota = jax.lax.broadcasted_iota(jnp.int32, (bp, win), 1)
        gs = []
        for j in range(kb):
            oh = (nbrl_ref[:, j][:, None] == iota).astype(window.dtype)
            gs.append(jax.lax.dot_general(
                oh, window, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(window.dtype))
        acc = _band_contract(gs, band_ref, bp, kb, zoco, tiles, cin, cout,
                             lead=lead)
        _epilogue(acc, bias_ref, resid_ref, occ_ref, e_ref, relu,
                  has_bias, has_resid, has_occ, o_ref, emit_occ=emit_occ)


def _band_contract(gs, band_ref, bp, kb, zoco, tiles, cin, cout,
                   lead=False):
    """Shared band contraction: gs[j] (bp, ZCP) gathered tap rows.
    With `lead` (agent-batched launch) band_ref carries a leading
    per-agent block dim of 1 (the BlockSpec selects the agent's band via
    block_index // nb); unbatched bands have NO lead dim — the r4
    always-lead layout cost ~6 ms/frame on the flagship bench (rank-4/5
    VMEM refs index worse through Mosaic)."""
    if tiles is None:
        acc = jnp.zeros((bp, zoco), jnp.float32)
        for j in range(kb):
            acc = acc + jax.lax.dot_general(
                gs[j], band_ref[0, j] if lead else band_ref[j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc
    t, tin, tstarts = tiles
    cols = []
    for ti, s0 in enumerate(tstarts):
        a = jnp.zeros((bp, t * cout), jnp.float32)
        lo = s0 * cin
        for j in range(kb):
            a = a + jax.lax.dot_general(
                gs[j][:, lo:lo + tin * cin],
                band_ref[0, j, ti] if lead else band_ref[j, ti],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        cols.append(a)
    return jnp.concatenate(cols, axis=1)[:, :zoco]


def _store_out(y, o_ref, occ_vals=None):
    """Store (bp, zoco) f32 `y` into o_ref, width-extending to the packed
    lane count: occupancy rides the first z_out pad lanes (packed chaining
    convention: the following down conv's fold_occ reads it there), the
    rest is zeroed so the pad-lane invariant holds."""
    ow = o_ref.shape[-1]
    zoco = y.shape[1]
    if ow > zoco:
        parts, w = [y], zoco
        if occ_vals is not None:
            parts.append(occ_vals.astype(jnp.float32))
            w += occ_vals.shape[1]
        if ow > w:
            parts.append(jnp.zeros((y.shape[0], ow - w), jnp.float32))
        y = jnp.concatenate(parts, axis=1)
    o_ref[...] = y.astype(o_ref.dtype)


def _epilogue(acc, bias_ref, resid_ref, occ_ref, e_ref, relu,
              has_bias, has_resid, has_occ, o_ref, emit_occ=False):
    zoco = acc.shape[1]
    if has_bias:
        acc = acc + bias_ref[0][None, :].astype(jnp.float32)
    if has_resid:
        acc = acc + resid_ref[...][:, :zoco].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    if has_occ:
        occx = jax.lax.dot_general(
            occ_ref[...].astype(e_ref.dtype), e_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = acc * occx
    _store_out(acc, o_ref,
               occ_ref[...] if (emit_occ and has_occ) else None)


PADG = 8  # guard rows inside the mid scratch buffer so the subm shift
#           slices never under/overflow (clamped DMA starts + per-block
#           zeroed guard rows replace the old whole-array jnp.pad, which
#           cost a ~60 MB HBM copy per conv at stage-0 shapes)


def _fused_kernel_v2(starts_ref, nbrl_ref, blkact_ref, *rest, win_d,
                     win_mid, bp, zoco, subm, has_bias, has_resid,
                     has_occ, relu, tiles, cin, cout, fold_occ=None,
                     zwin=None, emit_occ=False, lead=False):
    """3x3-BEV conv with per-dy-row windows: the 9 taps split into three
    dy groups whose neighbors each span a SHORT contiguous run of the
    sorted pillar order (measured p99 ~160 rows/group vs ~512 combined), so
    the one-hot gather contracts over win_d instead of the union window.
    For submanifold maps (subm=True) the middle group needs no one-hot at
    all: same-row neighbors are sorted-order adjacency, so g(dx=+/-1) are
    shifted static slices of the block's own rows, masked by existence.

    With `zwin` (subm only): per-BLOCK z-windowed compute — the DMA
    lane-slices each window to the block's occupied z range (measured
    max span 17 of 41 z cells over any 384-row window on calibrated
    clouds), the band contraction runs window-relative (zwin in/out),
    and the result is placed back at the absolute z offset. Exact: data
    outside a block's z window is identically zero (occupancy-masked),
    and blocks whose span overflows zwin take the fallback path.

    `blkact_ref` (SMEM, nb int32) marks blocks with any live output site
    (occupied pillar / valid tap). Dead blocks — the ~20% cap margin over
    real occupancy plus the invalid-pillar tail — skip their window DMAs,
    gathers, and band contraction and just write zeros, which is exact
    because the epilogue multiplies by (all-zero) occupancy anyway."""
    it = iter(rest)
    zoff_ref = next(it) if zwin else None
    mask_ref = next(it) if subm else None
    occ_ref = next(it) if has_occ else None
    resid_ref = next(it) if has_resid else None
    bias_ref = next(it) if has_bias else None
    e_ref = next(it) if (has_occ or fold_occ) else None
    s_ref = next(it) if fold_occ else None
    rows_hbm = next(it)
    band_ref = next(it)
    o_ref = next(it)
    occ_o_ref = next(it) if fold_occ else None
    buf_lo = next(it)
    buf_mid = next(it)
    buf_hi = next(it)
    kbuf = next(it) if (tiles is not None and KPACK) else None
    fullbuf = next(it) if zwin else None
    sem = next(it)
    rest_refs = (zoff_ref, mask_ref, occ_ref, resid_ref, bias_ref, e_ref,
                 s_ref, rows_hbm, band_ref, o_ref, occ_o_ref, buf_lo,
                 buf_mid, buf_hi, kbuf, fullbuf, sem)

    blk = pl.program_id(0)
    nblk = pl.num_programs(0)
    ow = o_ref.shape[-1]

    def dmas(slot, b_idx):
        s0 = pl.multiple_of(starts_ref[b_idx, 0], 8)
        s2 = pl.multiple_of(starts_ref[b_idx, 2], 8)
        s1 = pl.multiple_of(starts_ref[b_idx, 1], 8)
        if zwin:
            zq = pl.multiple_of(zoff_ref[b_idx] * cin, 128)
            lanes = pl.ds(zq, zwin * cin)
        else:
            lanes = slice(None)
        # subm: the mid window lands between PADG zeroed guard rows (the
        # shift slices may reach one row past either end at the array
        # boundaries, where the existence mask zeroes the contribution)
        mid_dst = (buf_mid.at[slot, pl.ds(PADG, win_mid)] if subm
                   else buf_mid.at[slot])
        return [
            pltpu.make_async_copy(rows_hbm.at[pl.ds(s0, win_d), lanes],
                                  buf_lo.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(rows_hbm.at[pl.ds(s1, win_mid), lanes],
                                  mid_dst, sem.at[slot, 1]),
            pltpu.make_async_copy(rows_hbm.at[pl.ds(s2, win_d), lanes],
                                  buf_hi.at[slot], sem.at[slot, 2]),
        ]

    act = blkact_ref[blk] != 0
    nxt = jnp.minimum(blk + 1, nblk - 1)
    nxt_act = (blk + 1 < nblk) & (blkact_ref[nxt] != 0)

    @pl.when(blk == 0)
    def _():
        if subm:
            # guard rows are never DMA targets: zero once, stay zero
            zcp_k = buf_mid.shape[-1]
            for s in range(2):
                buf_mid[s, :PADG] = jnp.zeros((PADG, zcp_k),
                                              buf_mid.dtype)
                buf_mid[s, PADG + win_mid:] = jnp.zeros(
                    (PADG, zcp_k), buf_mid.dtype)

    @pl.when((blk == 0) & act)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    @pl.when(nxt_act)
    def _():
        for cp in dmas((blk + 1) % 2, blk + 1):
            cp.start()

    @pl.when(~act)
    def _():
        o_ref[...] = jnp.zeros((bp, ow), o_ref.dtype)
        if fold_occ:
            occ_o_ref[...] = jnp.zeros(
                occ_o_ref.shape[-2:], occ_o_ref.dtype)

    @pl.when(act)
    def _compute():
        _fused_v2_compute(
            starts_ref, nbrl_ref, rest_refs, blk=blk, win_d=win_d,
            win_mid=win_mid, bp=bp, zoco=zoco, subm=subm,
            has_bias=has_bias, has_resid=has_resid, has_occ=has_occ,
            relu=relu, tiles=tiles, cin=cin, cout=cout, fold_occ=fold_occ,
            zwin=zwin, dmas=dmas, emit_occ=emit_occ, lead=lead)


def _fused_v2_compute(starts_ref, nbrl_ref, refs, *, blk, win_d, win_mid,
                      bp, zoco, subm, has_bias, has_resid, has_occ, relu,
                      tiles, cin, cout, fold_occ, zwin, dmas,
                      emit_occ=False, lead=False):
    (zoff_ref, mask_ref, occ_ref, resid_ref, bias_ref, e_ref, s_ref,
     rows_hbm, band_ref, o_ref, occ_o_ref, buf_lo, buf_mid, buf_hi,
     kbuf, fullbuf, sem) = refs

    for cp in dmas(blk % 2, blk):
        cp.wait()
    w_lo = buf_lo[blk % 2]
    w_mid = None if subm else buf_mid[blk % 2]
    w_hi = buf_hi[blk % 2]
    if subm:
        # own-block rows sit at guard offset PADG plus the clamp slack
        # (starts are clamped). Unbatched the block's own absolute row
        # start is statically blk*bp; batched it travels as starts
        # column 3 (per-agent segment offsets)
        own = starts_ref[blk, 3] if lead else blk * bp
        mid0 = own - starts_ref[blk, 1] + PADG

    # M-stacked one-hot gathers: the 3 taps of a dy group share one
    # window, so their one-hots stack along M into ONE (3*bp, win) @
    # (win, ZCP) matmul per group (same MACs, 2/3 fewer matmul launches
    # than per-tap gathers; per-launch overhead is ~10% of this kernel)
    iota = jax.lax.broadcasted_iota(jnp.int32, (bp, win_d), 1)

    def gather3(cols, wbuf):
        if ABLATE == "nogather":
            return [wbuf[:bp], wbuf[:bp], wbuf[:bp]]
        oh = jnp.concatenate(
            [(nbrl_ref[:, c][:, None] == iota).astype(wbuf.dtype)
             for c in range(cols[0], cols[0] + 3)], axis=0)
        # (bf16 accumulation would be exact here — one-hot rows — but
        # Mosaic requires 32-bit matmul accumulators, so the f32->bf16
        # cast stays)
        g = jax.lax.dot_general(
            oh, wbuf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(wbuf.dtype)
        return [g[j * bp:(j + 1) * bp] for j in range(3)]

    gs = gather3((0, 1, 2), w_lo)
    if subm:
        m = mask_ref[...]  # (bp, 3) existence of left/center/right
        # one ALIGNED dynamic slice (the clamp slack off = blk*bp - s1 is
        # a multiple of 8 by construction: bp, PADG, prow, win_mid all
        # are), then static +-1 sub-slices of the value — Mosaic cannot
        # prove unaligned dynamic sublane offsets
        off = pl.multiple_of(mid0 - PADG, 8)  # own - s1, all multiples of 8
        wm = buf_mid[blk % 2, pl.ds(off, bp + 2 * PADG)]
        gs.append(wm[PADG - 1:PADG - 1 + bp] * m[:, 0:1])
        gs.append(wm[PADG:PADG + bp] * m[:, 1:2])
        gs.append(wm[PADG + 1:PADG + 1 + bp] * m[:, 2:3])
        gs.extend(gather3((3, 4, 5), w_hi))
    else:
        gs.extend(gather3((3, 4, 5), w_mid))
        gs.extend(gather3((6, 7, 8), w_hi))

    zoco_c = zwin * cout if zwin else zoco  # contraction width
    if ABLATE == "noband":
        acc = sum(g[:, :zoco_c].astype(jnp.float32) for g in gs)
    elif tiles is None or not KPACK:
        acc = _band_contract(gs, band_ref, bp, 9, zoco_c, tiles, cin,
                             cout, lead=lead)
    elif True:
        # K-packed tiled band: the 9 taps' tile slices are stored
        # contiguously in K and contracted in ONE (bp, 9*Tin*Cin) matmul
        # per z-tile — removes the per-tap K padding (e.g. 160 -> 256
        # lanes = 1.6x wasted MXU streams at stage 0). kbuf's pad lanes
        # multiply zero band rows, so only a one-time NaN-guard zero of
        # the pad region is needed.
        t, tin, tstarts = tiles
        tcp = tin * cin
        kp = kbuf.shape[1]
        if kp > 9 * tcp:
            # unconditional per-block NaN-guard zero (block 0 may be
            # skipped by the dead-block gate, so "once at block 0" can't
            # be relied on; the pad store is tiny)
            kbuf[:, 9 * tcp:] = jnp.zeros((bp, kp - 9 * tcp), kbuf.dtype)
        cols = []
        for ti, s0 in enumerate(tstarts):
            lo = s0 * cin
            for j in range(9):
                kbuf[:, j * tcp:(j + 1) * tcp] = gs[j][:, lo:lo + tcp]
            cols.append(jax.lax.dot_general(
                kbuf[...], band_ref[0, ti] if lead else band_ref[ti],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        acc = jnp.concatenate(cols, axis=1)[:, :zoco_c]
    if zwin:
        # place the window-relative result back at its absolute z offset
        # (the rest of the row is exactly zero: occupancy-masked inputs)
        zq_out = pl.multiple_of(zoff_ref[blk] * cout, 128)
        fullbuf[...] = jnp.zeros((bp, zoco), jnp.float32)
        fullbuf[:, pl.ds(zq_out, zwin * cout)] = acc
        acc = fullbuf[...]
    if fold_occ:
        # occupancy rides as extra row columns [zc : zc+z_in] (free: the
        # one-hot gathers already span the padded lanes). Output occ =
        # any input occupied in the receptive field (spconv site rule),
        # via one (bp, Z_in) @ (Z_in, Z_out) z-stencil matmul (og is
        # exactly 0/1, so clamp(sum) == any).
        z_in, z_out, zc = fold_occ
        og = gs[0][:, zc:zc + z_in]
        for j in range(1, 9):
            og = jnp.maximum(og, gs[j][:, zc:zc + z_in])
        occ_sum = jax.lax.dot_general(
            og, s_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        occ_new = jnp.minimum(occ_sum, 1.0)
        occ_o_ref[...] = occ_new.astype(occ_o_ref.dtype)
        if has_bias:
            acc = acc + bias_ref[0][None, :].astype(jnp.float32)
        if has_resid:
            acc = acc + resid_ref[...][:, :zoco].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        occx = jax.lax.dot_general(
            occ_new.astype(e_ref.dtype), e_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        _store_out(acc * occx, o_ref, occ_new if emit_occ else None)
    else:
        _epilogue(acc, bias_ref, resid_ref, occ_ref, e_ref, relu,
                  has_bias, has_resid, has_occ, o_ref, emit_occ=emit_occ)


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
    feats: jnp.ndarray,            # (P_in, Z_in, Cin) or (P_in, ZCP)
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
    band: Optional[jnp.ndarray] = None,      # prebuilt via build_band
    relu: bool = False,
    bp: int = 128,
    win: int = 512,
    subm: bool = False,
    occ_in: Optional[jnp.ndarray] = None,    # (P_in, Z_in) bool
    fold_occ: bool = False,
    packed_shape: Optional[Tuple[int, int]] = None,  # (Z_in, Cin)
    emit_occ_lanes: bool = False,
    agents: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """conv (+BN eval) (+residual) (+ReLU) (+occupancy mask), one kernel.

    Returns (P_out, Z_out, Cout). Falls back to the XLA path when the
    window invariant does not hold (runtime `lax.cond`) or when shapes are
    unsupported (static). For 9-tap BEV kernels `win` is the PER-DY-ROW
    window (kernel v2); `subm=True` additionally replaces the middle row's
    one-hot gathers with sorted-order adjacency shifts (self-verified at
    runtime: a map without subm structure falls back to the XLA path).

    With `fold_occ=True` (+ `occ_in`, down convs only): the output-site
    occupancy is computed IN kernel — occupancy rides as extra row columns
    inside the lane padding, so the gather is free — and returned as a
    second output: `(out, occ_out_bool)`. `occ_out` must be None.

    Packed chaining (`packed_shape=(Z_in, Cin)`): `feats` is a 2D
    lane-padded rows array (P_in, ZCP) with ZCP = 128-aligned Z_in*Cin and
    zero pad lanes, `residual` likewise (P, ZCP_out); the result is
    (P_out, ZCP_out) in the same convention, so a conv chain never pays
    the per-conv jnp.pad/layout copies of the 3D interface (measured ~5 ms
    per encoder at stage-0 shapes). `emit_occ_lanes=True` writes the
    output-site occupancy into pad lanes [zoco, zoco+Z_out) — where the
    following down conv's `fold_occ` reads it; with `fold_occ` under
    packed input the occupancy must already sit in feats' lanes
    [zc, zc+Z_in) (the producing conv emitted it).

    Agent batching (`agents=A`, coop eval): every array operand carries a
    leading agent dim — feats (A, P, ZCP) [packed only], nbr (A, P, KB),
    weights (A, K, Cin, Cout), scale/bias (A, Cout), occ/residual/band
    likewise — and the A agents' convs run as ONE kernel launch over a
    flat (A*nb,) block grid: rows are laid out as A contiguous segments
    of a flat (A*prow, ZCP) array (window starts carry the segment
    offset, so windows never cross agents), while the per-agent band and
    bias ride BlockSpecs indexed by block//nb. One launch instead of A
    pipelines the window DMAs across the agent boundary and halves the
    XLA-side planning ops. Returns (A, P_out, OW) (+ (A, P_out, Z_out)
    occupancy for fold_occ). The retry ladder is shared: one agent's
    overflow retries both (rare by construction).
    """
    batched = agents is not None
    a_n = agents if batched else 1
    if batched:
        assert packed_shape is not None and feats.ndim == 3, (
            "agent batching requires packed rows")
        assert feats.shape[0] == a_n and nbr.shape[0] == a_n
        assert weights.ndim == 4 and weights.shape[0] == a_n
    else:
        feats = feats[None]
        nbr = nbr[None]
        weights = weights[None]
        scale = None if scale is None else scale[None]
        bias = None if bias is None else bias[None]
        occ_out = None if occ_out is None else occ_out[None]
        residual = None if residual is None else residual[None]
        occ_in = None if occ_in is None else occ_in[None]
        # band keeps NO lead dim unbatched (the in-kernel refs index it
        # directly; see _band_contract's lead note)

    if packed_shape is not None:
        z_in, cin = packed_shape
        _, p_in, zcp = feats.shape
        assert zcp % 128 == 0 and zcp >= z_in * cin, (zcp, packed_shape)
    else:
        _, p_in, z_in, cin = feats.shape
        zcp = _round_up(z_in * cin + (z_in if fold_occ else 0), 128)
    p_out, kb = nbr.shape[1], nbr.shape[2]
    cout = weights.shape[3]
    z_out = (z_in + 2 * z_pad - kz) // z_stride + 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    zc = z_in * cin
    zoco = z_out * cout
    packed = packed_shape is not None
    ow = _round_up(zoco, 128) if packed else zoco
    if emit_occ_lanes:
        assert packed and zoco + z_out <= ow and (
            occ_out is not None or fold_occ), (zoco, z_out, ow)
    nb = p_out // bp
    nbt = a_n * nb  # total kernel blocks across agents
    use_v2 = kb == 9

    if fold_occ:
        assert occ_out is None and not subm
        assert occ_in is not None or packed

    # ---- per-agent slow/fallback helpers (unbatched slices) ----
    def feats3(f):
        if packed:
            return f[:, :zc].reshape(p_in, z_in, cin)
        return f

    def occ_in3(f, oi):
        if oi is not None:
            return oi
        return f[:, zc:zc + z_in] > 0.5  # packed occ lanes

    def residual3(r):
        if r is None or not packed:
            return r
        return r[:, :zoco].reshape(p_out, z_out, cout)

    def rows_out(out3, occ_vals=None):
        """(P, Z_out, Cout) -> output rows (P, OW), packed conventions."""
        r = out3.reshape(p_out, zoco)
        parts, wnow = [r], zoco
        if emit_occ_lanes and occ_vals is not None:
            parts.append(occ_vals.astype(r.dtype))
            wnow += z_out
        if ow > wnow:
            parts.append(jnp.zeros((p_out, ow - wnow), r.dtype))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else r

    def slow_fold_one(f, nb_, w_, s_, b_, oi, res):
        occ_x = pu.occ_downsample(occ_in3(f, oi), nb_, kz, z_stride, z_pad)
        out = _xla_reference(feats3(f), nb_, w_, kz, z_stride, z_pad,
                             s_, b_, occ_x, residual3(res), relu)
        return rows_out(out, occ_x), occ_x.astype(out.dtype)

    def slow_plain_one(f, nb_, w_, s_, b_, oo, res):
        out = _xla_reference(feats3(f), nb_, w_, kz, z_stride, z_pad,
                             s_, b_, oo, residual3(res), relu)
        return rows_out(out, oo)

    def map_agents(fn, *ops):
        """Run per-agent `fn` over stacked operands (None passes through;
        direct call at A=1 — a length-1 scan costs real dispatch time)."""
        present = [i for i, o in enumerate(ops) if o is not None]

        def call(sel):
            full = list(ops)
            for i, v in zip(present, sel):
                full[i] = v
            return fn(*full)

        sel_ops = tuple(ops[i] for i in present)
        if a_n == 1:
            return jax.tree.map(
                lambda x: x[None], call(tuple(o[0] for o in sel_ops)))
        return jax.lax.map(call, sel_ops)

    def final_out(out_rows):   # (A, P_out, OW) stacked rows
        if not packed:
            out_rows = out_rows[..., :zoco].reshape(
                a_n, p_out, z_out, cout)
        return out_rows if batched else out_rows[0]

    def final_occ(occ_f):      # (A, P_out, Z_out) float or bool
        occ_b = occ_f if occ_f.dtype == jnp.bool_ else occ_f > 0.5
        return occ_b if batched else occ_b[0]

    unsupported = (p_out % bp != 0 or kb * kz != weights.shape[1]
                   or p_in < 8 or win % 8 != 0
                   or (subm and p_out != p_in)
                   or (batched and p_in % 8 != 0)
                   or (fold_occ and (not use_v2 or zc + z_in > zcp)))
    if unsupported:
        if fold_occ:
            out, occ_f = map_agents(slow_fold_one, feats, nbr, weights,
                                    scale, bias, occ_in, residual)
            return final_out(out), final_occ(occ_f)
        out = map_agents(slow_plain_one, feats, nbr, weights, scale,
                         bias, occ_out, residual)
        return final_out(out)

    if packed:
        rows = feats
    else:
        rows = feats.reshape(a_n, p_in, zc)
        if fold_occ:
            rows = jnp.concatenate(
                [rows, occ_in.astype(rows.dtype)], axis=2)
        if zcp != rows.shape[2]:
            rows = jnp.pad(rows, ((0, 0), (0, 0),
                                  (0, zcp - rows.shape[2])))

    nblk = nbr.reshape(nbt, bp, kb)
    # dead-block gate: a block whose output sites are all unoccupied (or,
    # for fold_occ, whose taps are all misses) produces exact zeros through
    # the occupancy epilogue — skip its DMAs and matmuls in-kernel. The
    # pillar caps carry ~20% margin over real occupancy plus the invalid
    # tail, so this recovers the margin cost at full caps.
    if occ_out is not None:
        blk_act = occ_out.astype(bool).reshape(nbt, bp, -1).any(axis=(1, 2))
    elif fold_occ:
        blk_act = (nblk < p_in).any(axis=(1, 2))
    else:
        blk_act = jnp.ones((nbt,), bool)
    if use_v2:
        win_mid = bp + 2 * PADG if subm else win
        # no whole-array guard/tail pad: window starts are CLAMPED to the
        # agent's row segment instead (one-hot misses make out-of-window
        # taps exact zeros, so a clamped window only needs to contain the
        # valid taps, which the overflow guard already certifies). Tiny
        # inputs that cannot fit the 2x retry window keep a tail pad
        # (test shapes); batched rows pad to a block multiple so absolute
        # row//bp block indexing stays exact across segments.
        need = max(2 * win, win_mid)
        if batched:
            need = _round_up(need, bp)
        if rows.shape[1] < need:
            rows = jnp.pad(rows, ((0, 0), (0, need - rows.shape[1]),
                                  (0, 0)))
        prow = rows.shape[1]
        if batched:
            # per-block agent segment offset into the flat (A*prow) rows,
            # and each block's own absolute row start (subm mid window)
            seg = (jnp.arange(nbt, dtype=jnp.int32) // nb) * prow
            own = seg + (jnp.arange(nbt, dtype=jnp.int32) % nb) * bp

        def group(taps, wind):
            vals = nblk[:, :, taps]                      # (nbt, bp, 3)
            gvalid = vals < p_in                         # per-agent ids
            if batched:
                vabs = vals + seg[:, None, None]         # flat row ids
                gmin = jnp.min(
                    jnp.where(gvalid, vabs, seg[:, None, None] + p_in),
                    axis=(1, 2))
                gstart = (jnp.clip(gmin, seg, seg + prow - wind)
                          // 8 * 8).astype(jnp.int32)
                loc = vabs - gstart[:, None, None]
            else:
                gmin = jnp.min(jnp.where(gvalid, vals, p_in), axis=(1, 2))
                gstart = (jnp.clip(gmin, 0, prow - wind)
                          // 8 * 8).astype(jnp.int32)
                loc = vals - gstart[:, None, None]
            inw = gvalid & (loc >= 0) & (loc < wind)
            # dead blocks never execute: their taps can't overflow
            ovf = jnp.any((gvalid & ~inw) & blk_act[:, None, None])
            return (gstart, jnp.where(inw, loc, wind).astype(
                jnp.int32), ovf)

        def window_plan(wind):
            s0, loc0, ovf0 = group([0, 1, 2], wind)
            s2, loc2, ovf2 = group([6, 7, 8], wind)
            if subm:
                overflow = ovf0 | ovf2 | struct_bad
                # own-rows mid window, clamped (within the agent segment
                # when batched); the kernel re-derives the block's offset
                # (own - s1) against its guard rows
                if batched:
                    s1 = jnp.clip(own - PADG, seg, seg + prow - win_mid)
                else:
                    s1 = jnp.clip(
                        jnp.arange(nb, dtype=jnp.int32) * bp - PADG,
                        0, prow - win_mid)
                local = jnp.concatenate(
                    [loc0, loc2], axis=2).reshape(nbt * bp, 6)
            else:
                s1, loc1, ovf1 = group([3, 4, 5], wind)
                overflow = ovf0 | ovf1 | ovf2
                local = jnp.concatenate(
                    [loc0, loc1, loc2], axis=2).reshape(nbt * bp, 9)
            # batched: column 3 carries each block's own absolute row
            # start (the kernel cannot derive it statically across agent
            # segments); unbatched keeps the original 3-column layout
            cols = [s0, s1, s2] + ([own] if batched else [])
            return jnp.stack(cols, axis=1), local, overflow

        if subm:
            gidx = jnp.tile(jnp.arange(p_out, dtype=jnp.int32), a_n)
            flat = nbr.reshape(a_n * p_out, kb)
            ok = ((flat[:, 4] == gidx) | (flat[:, 4] == p_in)) & \
                 ((flat[:, 3] == gidx - 1) | (flat[:, 3] == p_in)) & \
                 ((flat[:, 5] == gidx + 1) | (flat[:, 5] == p_in))
            struct_bad = jnp.any(~ok)
            adj = (flat[:, 3:6] < p_in).astype(feats.dtype)
        else:
            struct_bad = jnp.zeros((), bool)
            adj = None
        start, local, overflow = window_plan(win)

        # per-block z-windowed compute (subm only): measured per-block
        # z spans are <=17 of 41 cells at stage 0 (runs/tpu_probe.log),
        # so the gathers and band contraction run on a zwin-cell window
        # at each block's occupied z range; blocks whose span overflows
        # take the exact fallback. Alignment: zoff quantized so both
        # zoff*cin and zoff*cout are 128-lane multiples.
        zwin, tiles = band_plan(
            z_in=z_in, cin=cin, cout=cout, kz=kz, z_stride=z_stride,
            z_pad=z_pad, kb=kb, subm=subm,
            has_occ_out=occ_out is not None, fold_occ=fold_occ)
        if zwin:
            zq_ = max(128 // cin, 128 // cout, 2)
            zidx = jnp.arange(z_in, dtype=jnp.int32)
            ob = occ_out.astype(bool).reshape(a_n * p_out, z_out)
            zmin_p = jnp.min(jnp.where(ob, zidx[None, :], z_in), axis=1)
            zmax_p = jnp.max(jnp.where(ob, zidx[None, :], -1), axis=1)
            # two-stage block reduction (a direct reduce_window with a
            # ~1.1k window lowers as O(P*window) VPU work): per-block
            # min/max, then per-plan union over the blocks each window
            # DMA actually reads (derived from the clamped starts, NOT a
            # fixed block neighborhood — windows can land far from the
            # block's own rows on dense clouds). Per-agent sentinel
            # padding keeps absolute-row-block indexing exact when rows
            # are padded; a window's +2 slack can peek into the next
            # agent's first blocks, which only widens the z union
            # (conservative, still exact).
            bmin = zmin_p.reshape(nbt, bp).min(axis=1)
            bmax = zmax_p.reshape(nbt, bp).max(axis=1)
            nbp_a = prow // bp
            pad_a = nbp_a - nb
            bmin2 = bmin.reshape(a_n, nb)
            bmax2 = bmax.reshape(a_n, nb)
            if pad_a > 0:
                bmin2 = jnp.pad(bmin2, ((0, 0), (0, pad_a)),
                                constant_values=z_in)
                bmax2 = jnp.pad(bmax2, ((0, 0), (0, pad_a)),
                                constant_values=-1)
            bminp = jnp.concatenate(
                [bmin2.reshape(-1), jnp.full((2,), z_in, bmin.dtype)])
            bmaxp = jnp.concatenate(
                [bmax2.reshape(-1), jnp.full((2,), -1, bmax.dtype)])
            nbp_tot = int(bminp.shape[0])

            def zplan(starts_arr, wind):
                zlo = jnp.full((nbt,), z_in, jnp.int32)
                zhi = jnp.full((nbt,), -1, jnp.int32)
                for g in range(3):
                    wg = win_mid if (subm and g == 1) else wind
                    first = starts_arr[:, g] // bp
                    for k in range(wg // bp + 2):
                        idx = jnp.minimum(first + k, nbp_tot - 1)
                        zlo = jnp.minimum(zlo, bminp[idx])
                        zhi = jnp.maximum(zhi, bmaxp[idx])
                zo = jnp.clip((zlo - 1) // zq_ * zq_, 0,
                              z_in - zwin).astype(jnp.int32)
                zv = jnp.any(blk_act & (zhi > zo + (zwin - 2)))
                return zo, zv

            zoffs, z_ovf = zplan(start, win)
        else:
            zplan = None
            zoffs = None
            z_ovf = jnp.zeros((), bool)
    else:
        if p_in < win:
            rows = jnp.pad(rows, ((0, 0), (0, win - p_in), (0, 0)))
        prow = rows.shape[1]
        valid = nblk < p_in
        if batched:
            seg = (jnp.arange(nbt, dtype=jnp.int32) // nb) * prow
            vabs = nblk + seg[:, None, None]
            start = jnp.min(
                jnp.where(valid, vabs, seg[:, None, None] + p_in),
                axis=(1, 2))
            start = (jnp.clip(start, seg, seg + max(prow - win, 0))
                     // 8 * 8).astype(jnp.int32)
            local = vabs - start[:, None, None]
        else:
            start = jnp.min(jnp.where(valid, nblk, p_in), axis=(1, 2))
            start = (jnp.clip(start, 0, max(prow - win, 0))
                     // 8 * 8).astype(jnp.int32)
            local = nblk - start[:, None, None]
        in_win = (local >= 0) & (local < win)
        overflow = jnp.any((valid & ~in_win) & blk_act[:, None, None])
        local = jnp.where(valid & in_win, local, win).astype(jnp.int32)
        local = local.reshape(nbt * bp, kb)
        adj = None
        zwin, zoffs, z_ovf = None, None, jnp.zeros((), bool)

    if not use_v2:
        _, tiles = band_plan(
            z_in=z_in, cin=cin, cout=cout, kz=kz, z_stride=z_stride,
            z_pad=z_pad, kb=kb, subm=subm,
            has_occ_out=occ_out is not None, fold_occ=fold_occ)
    if band is None:
        bb = functools.partial(
            build_band, z_in=z_in, cin=cin, cout=cout, kz=kz,
            z_stride=z_stride, z_pad=z_pad, zwin=zwin, tiles=tiles,
            zcp=zcp, dtype=feats.dtype)
        if batched:
            band = (jax.vmap(lambda w_: bb(w_, None))(weights)
                    if scale is None else jax.vmap(bb)(weights, scale))
        else:
            band = bb(weights[0],
                      None if scale is None else scale[0])
    else:
        band = band.astype(feats.dtype)

    has_bias = bias is not None
    has_resid = residual is not None
    has_occ = occ_out is not None

    n_loc = local.shape[1]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # starts
        pl.BlockSpec((bp, n_loc), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),                    # local idx
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # blk act
    ]
    operands = [blk_act.astype(jnp.int32)]
    zoffs_slot = None
    if zwin:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        zoffs_slot = len(operands)
        operands.append(zoffs)
    if use_v2 and subm:
        in_specs.append(pl.BlockSpec((bp, 3), lambda b: (b, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(adj)
    if has_occ:
        in_specs.append(pl.BlockSpec((bp, z_out), lambda b: (b, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(
            occ_out.reshape(a_n * p_out, z_out).astype(feats.dtype))
    if has_resid:
        rw = residual.shape[-1] if packed else zoco
        in_specs.append(pl.BlockSpec((bp, rw), lambda b: (b, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(
            residual.reshape(a_n * p_out, rw).astype(feats.dtype))
    if has_bias:
        bias_rows = jnp.tile(bias.astype(jnp.float32), (1, z_out))
        if batched:
            # per-agent bias row, selected by the block's agent
            # (block//nb). Each agent's row is replicated to 8 sublanes:
            # TPU block shapes need an 8-divisible sublane dim (a
            # (1, zoco) block over an (A, zoco) array fails Mosaic's
            # divisibility check on hardware — interpret mode does not
            # enforce it).
            in_specs.append(pl.BlockSpec(
                (8, zoco), lambda b: (b // nb, 0),
                memory_space=pltpu.VMEM))
            operands.append(jnp.repeat(bias_rows, 8, axis=0))
        else:
            # unbatched: full-array spec — a BLOCKED spec would make
            # Mosaic double-buffer the row (2x VMEM for a constant)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            operands.append(bias_rows)
    if has_occ or fold_occ:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        e = jnp.repeat(jnp.eye(z_out, dtype=feats.dtype), cout, axis=1)
        operands.append(e)  # (Z_out, Z_out*Cout) occupancy expander
    if fold_occ:
        # z-stencil: S[zi, zo] = 1 iff input z feeds output z at some tap
        zi = jnp.arange(z_in)
        zo = jnp.arange(z_out)
        s_mat = jnp.any(
            zi[None, :, None] + z_pad ==
            zo[None, None, :] * z_stride + jnp.arange(kz)[:, None, None],
            axis=0).astype(feats.dtype)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(s_mat)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))            # rows
    if batched:
        # per-agent band block (block//nb). Blocked specs are
        # double-buffered by Mosaic — acceptable here because the agent
        # pipelining is the point of the batched launch.
        band_zeros = (0,) * (band.ndim - 1)
        in_specs.append(pl.BlockSpec(
            (1,) + band.shape[1:], lambda b: (b // nb,) + band_zeros,
            memory_space=pltpu.VMEM))
    else:
        # unbatched: full-array spec — a blocked spec would double-buffer
        # the (up to ~2 MB) band and blow the 16M scoped-VMEM budget at
        # the deep-stage retry windows
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    operands += [rows.reshape(a_n * prow, zcp), band]

    fold = (z_in, z_out, zc) if fold_occ else None

    def make_kernel(wind):
        if use_v2:
            wmid = bp + 2 * PADG if subm else wind
            body = functools.partial(
                _fused_kernel_v2, win_d=wind, win_mid=wmid, bp=bp,
                zoco=zoco, subm=subm, has_bias=has_bias,
                has_resid=has_resid, has_occ=has_occ, relu=relu,
                tiles=tiles, cin=cin, cout=cout, fold_occ=fold,
                zwin=zwin, emit_occ=emit_occ_lanes, lead=batched)
            zcp_k = zwin * cin if zwin else zcp
            scratch = [
                pltpu.VMEM((2, wind, zcp_k), feats.dtype),
                pltpu.VMEM((2, wmid + (2 * PADG if subm else 0), zcp_k),
                           feats.dtype),
                pltpu.VMEM((2, wind, zcp_k), feats.dtype),
            ]
            if tiles is not None and KPACK:
                t_, tin_, _ = tiles
                scratch.append(pltpu.VMEM(
                    (bp, _round_up(kb * tin_ * cin, 128)), feats.dtype))
            if zwin:
                scratch.append(pltpu.VMEM((bp, zoco), jnp.float32))
            scratch.append(pltpu.SemaphoreType.DMA((2, 3)))
        else:
            body = functools.partial(
                _fused_kernel, win=wind, bp=bp, kb=kb, zoco=zoco,
                has_bias=has_bias, has_resid=has_resid, has_occ=has_occ,
                relu=relu, tiles=tiles, cin=cin, cout=cout,
                emit_occ=emit_occ_lanes, lead=batched)
            scratch = [
                pltpu.VMEM((2, wind, zcp), feats.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        out_specs = pl.BlockSpec((bp, ow), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((a_n * p_out, ow), feats.dtype)
        if fold_occ:
            out_specs = [out_specs,
                         pl.BlockSpec((bp, z_out), lambda b: (b, 0),
                                      memory_space=pltpu.VMEM)]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((a_n * p_out, z_out),
                                              feats.dtype)]
        return pl.pallas_call(
            body,
            grid=(nbt,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )

    def shape_out(res):
        """Flat kernel outputs -> stacked (A, P_out, ...)."""
        if fold_occ:
            out, occ_f = res
            return (out.reshape(a_n, p_out, ow),
                    occ_f.reshape(a_n, p_out, z_out))
        return res.reshape(a_n, p_out, ow)

    if fold_occ:
        def slow(_):
            out, occ_f = map_agents(slow_fold_one, feats, nbr, weights,
                                    scale, bias, occ_in, residual)
            if packed:
                out = _pin_rows_layout(
                    out.reshape(a_n * p_out, ow), bp,
                    interpret).reshape(a_n, p_out, ow)
            return out, occ_f
    else:
        def slow(_):
            out = map_agents(slow_plain_one, feats, nbr, weights, scale,
                             bias, occ_out, residual)
            if packed:
                out = _pin_rows_layout(
                    out.reshape(a_n * p_out, ow), bp,
                    interpret).reshape(a_n, p_out, ow)
            return out

    def ops_with(zo):
        if zoffs_slot is None:
            return operands
        return (operands[:zoffs_slot] + [zo]
                + operands[zoffs_slot + 1:])

    def fast(_):
        return shape_out(make_kernel(win)(start, local, *operands))

    def finalize(res):
        if fold_occ:
            out, occ_f = res
            return final_out(out), final_occ(occ_f)
        return final_out(res)

    if not use_v2:
        return finalize(jax.lax.cond(overflow, slow, fast, None))

    # retry ladder: win -> 2x win -> XLA reference. Windows are sized to
    # measured p100 spans with thin margins; an unusual cloud pays one 2x
    # retry instead of the catastrophic exact path. The wide plan (and
    # its own z-window plan) lives INSIDE the cond branch so it costs
    # nothing on the fast path.
    def retry(_):
        start2, local2, ovf_wide = window_plan(2 * win)
        if zwin:
            zoffs2, z_ovf2 = zplan(start2, 2 * win)
        else:
            zoffs2, z_ovf2 = None, jnp.zeros((), bool)

        def fast2(_):
            return shape_out(
                make_kernel(2 * win)(start2, local2, *ops_with(zoffs2)))
        return jax.lax.cond(ovf_wide | z_ovf2, slow, fast2, None)

    def laddered(_):
        return jax.lax.cond(overflow | z_ovf, retry, fast, None)

    return finalize(laddered(None))
