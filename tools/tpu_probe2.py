#!/usr/bin/env python
"""Probe 2: (a) transpose-free conv on tiles, (b) Mosaic in-VMEM gather,
(c) Pallas fused window kernel prototype (onehot-gather + band matmul).
Appends to runs/pillar_probe.log."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.tpu_pillar_probe import log, timeit, realistic_cloud


def main():
    from cmtcoop_tpu.ops.voxelize import voxelize, hard_simple_vfe
    from cmtcoop_tpu.ops import pillars as pu

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    pts = jnp.asarray(realistic_cloud())
    msk = jnp.ones((pts.shape[0],), bool)
    vox = jax.jit(lambda p, m: voxelize(
        p, m, voxel_size=(0.1, 0.1, 0.2),
        pc_range=(-72.0, -72.0, -8.0, 72.0, 72.0, 0.0),
        grid_size=(1440, 1440, 40), max_points=10, max_voxels=65536))(
            pts, msk)
    feats5 = hard_simple_vfe(vox)
    P = 49152
    pcoords, pmask, occ, _ = jax.jit(lambda c, m, f: pu.build_pillars(
        c, m, f, (1440, 1440), 41, P))(vox.coords, vox.mask, feats5)
    nbr = np.asarray(jax.jit(lambda c, m: pu.pillar_neighbor_map(
        pu.PillarGrid(c, m, (1440, 1440), 41)))(pcoords, pmask))

    Z, C, CO = 41, 16, 16
    feats = jnp.asarray(rng.normal(size=(P, Z, C)).astype(np.float32),
                        dtype=dtype)
    w = jnp.asarray(rng.normal(size=(27, C, CO)).astype(np.float32),
                    dtype=dtype)
    nb_t = jnp.asarray(nbr.astype(np.int32))

    # (a) v6: conv directly on gathered (P, 9, Z+2, C) tiles, no transpose
    def v6(f, n, w_):
        p_, z_, c_ = f.shape
        padded = jnp.concatenate([f, jnp.zeros((1, z_, c_), f.dtype)], 0)
        zp = jnp.zeros((p_ + 1, 1, c_), f.dtype)
        padded = jnp.concatenate([zp, padded, zp], 1)
        tiles = padded[n]  # (P, 9, Z+2, C)
        w4 = w_.reshape(3, 9, c_, -1).transpose(1, 0, 2, 3)  # (9,3,C,CO)
        out = jax.lax.conv_general_dilated(
            tiles, w4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out.astype(f.dtype)  # (P, 1, Z, CO)
    timeit(jax.jit(v6), feats, nb_t, w, name="s0_v6_convtiles")

    # (b) Mosaic in-VMEM row gather
    WIN, BP = 512, 128
    win_rows = jnp.asarray(
        rng.normal(size=(WIN, 656)).astype(np.float32), dtype=dtype)
    idx = jnp.asarray(rng.integers(0, WIN, (BP * 9,)).astype(np.int32))

    def take_kernel(w_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(w_ref[:], i_ref[:], axis=0)

    try:
        tk = pl.pallas_call(
            take_kernel,
            out_shape=jax.ShapeDtypeStruct((BP * 9, 656), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        ref = np.asarray(win_rows)[np.asarray(idx)]
        got = np.asarray(tk(win_rows, idx))
        ok = np.allclose(ref.astype(np.float32), got.astype(np.float32))
        log(f"mosaic_take_rows: LOWERED, correct={ok}")
        big = jax.jit(lambda w_, i_: tk(w_, i_))
        timeit(big, win_rows, idx, name="mosaic_take_rows_128x9of512")
    except Exception as e:
        log(f"mosaic_take_rows: FAILED: {str(e)[:300]}")

    # (c) fused prototype: window DMA + onehot gather + band matmul
    ZC = Z * C           # 656
    ZO_CO = Z * CO       # 656
    KB = 9

    def band_matrix(w_, z_in, z_out, c_, co_, z_stride=1, z_pad=1):
        w4 = w_.reshape(3, KB, c_, co_).astype(jnp.float32)
        zi = jnp.arange(z_in)
        zo = jnp.arange(z_out)
        # ind[dz, zi, zo] = (zi + pad == zo*s + dz)
        ind = (zi[None, :, None] + z_pad ==
               zo[None, None, :] * z_stride +
               jnp.arange(3)[:, None, None]).astype(jnp.float32)
        b = jnp.einsum("dpq,djio->jpiqo", ind, w4)
        return b.reshape(KB, z_in * c_, z_out * co_).astype(dtype)

    NB = P // BP

    def fused_kernel(starts_ref, nbrl_ref, feats_hbm, b_ref, o_ref,
                     win_buf, sem, *, win, bp, kb, zc, zoco):
        blk = pl.program_id(0)
        nblk = pl.num_programs(0)

        def dma(slot, b_idx):
            s = pl.multiple_of(starts_ref[b_idx], 8)
            return pltpu.make_async_copy(
                feats_hbm.at[pl.ds(s, win), :],
                win_buf.at[slot], sem.at[slot])

        @pl.when(blk == 0)
        def _():
            dma(0, 0).start()

        @pl.when(blk + 1 < nblk)
        def _():
            dma((blk + 1) % 2, blk + 1).start()

        dma(blk % 2, blk).wait()
        window = win_buf[blk % 2]  # (win, ZC)

        acc = jnp.zeros((bp, zoco), jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (bp, win), 1)
        for j in range(kb):
            oh = (nbrl_ref[:, j][:, None] == iota).astype(window.dtype)
            g = jax.lax.dot_general(
                oh, window, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(window.dtype)
            acc = acc + jax.lax.dot_general(
                g, b_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)

    ZCP = (ZC + 127) // 128 * 128  # lane-aligned row width

    def fused(f, n, w_):
        rows = f.reshape(P, ZC)
        rows = jnp.pad(rows, ((0, 0), (0, ZCP - ZC)))
        nblk = n.reshape(NB, BP, KB)
        valid = nblk < P
        start = jnp.min(jnp.where(valid, nblk, P), axis=(1, 2))
        # DMA slice starts must be divisible by the sublane tiling (8)
        start = (jnp.clip(start, 0, P - WIN) // 8 * 8).astype(jnp.int32)
        local = nblk - start[:, None, None]
        local = jnp.where(valid & (local >= 0) & (local < WIN),
                          local, WIN).astype(jnp.int32)
        b = band_matrix(w_, Z, Z, C, CO)
        b = jnp.pad(b, ((0, 0), (0, ZCP - ZC), (0, 0)))
        out = pl.pallas_call(
            functools.partial(fused_kernel, win=WIN, bp=BP, kb=KB,
                              zc=ZCP, zoco=ZO_CO),
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # starts (NB,)
                pl.BlockSpec((BP, KB), lambda b_: (b_, 0),
                             memory_space=pltpu.VMEM),   # local idx
                pl.BlockSpec(memory_space=pltpu.ANY),    # feats rows
                pl.BlockSpec(memory_space=pltpu.VMEM),   # band (KB,ZC,ZOCO)
            ],
            out_specs=pl.BlockSpec((BP, ZO_CO), lambda b_: (b_, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, ZO_CO), f.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, WIN, ZCP), f.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(start, local.reshape(NB * BP, KB), rows, b)
        return out

    try:
        fj = jax.jit(fused)
        out = np.asarray(fj(feats, nb_t, w)).astype(np.float32)
        ref = np.asarray(
            jax.jit(lambda f, n, w_: pu.pillar_conv(f, n, w_, 3, 1, 1))(
                feats, nb_t, w)).astype(np.float32).reshape(P, ZO_CO)
        err = np.abs(out - ref).max()
        rel = err / (np.abs(ref).max() + 1e-9)
        log(f"fused_proto: max_abs_err={err:.4f} rel={rel:.5f}")
        timeit(fj, feats, nb_t, w, name="s0_fused_proto")
    except Exception as e:
        import traceback
        log(f"fused_proto FAILED: {traceback.format_exc()[-1200:]}")

    log("probe2 done")


if __name__ == "__main__":
    main()
