#!/usr/bin/env python
"""Round-2 probe: pillar-conv implementation variants at production shapes.

Finds the fastest formulation of the sparse-BEV x dense-z conv (the whole
round-1 FPS gap) before committing to a Pallas kernel. Appends to
runs/pillar_probe.log. Variants:

  v0  current pillar_conv (gather tiles -> transpose -> folded lax.conv)
  v1  per-offset monotone gather + per-offset z-conv accumulate
  v3  block-windowed one-hot-matmul gather -> folded lax.conv
  v5  flat gather + dot_general (no transpose, 3 shifted slices over z)

Also reports the neighbor-window span distribution on a realistic cloud
(what WINDOW a fused kernel needs) and build_pillars cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOG = open(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs", "pillar_probe.log"), "a", 1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


_FETCH = None


def fetch_overhead():
    global _FETCH
    if _FETCH is None:
        f = jax.jit(lambda x: x * 1.0)
        x = jnp.ones((8, 128))
        float(jnp.sum(f(x)))
        t0 = time.time()
        n = 20
        for _ in range(n):
            float(jnp.sum(f(x)))
        _FETCH = (time.time() - t0) / n
        log(f"fetch_overhead: {_FETCH*1e3:.1f} ms")
    return _FETCH


def timeit(fn, *args, iters=15, name=""):
    t0 = time.time()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    log(f"{name}: compile+first {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / iters - fetch_overhead()
    log(f"{name}: {dt * 1e3:.2f} ms")
    return dt


def realistic_cloud(n=72000, seed=0):
    rng = np.random.default_rng(seed)
    n_ground = int(n * 0.55)
    n_obj = int(n * 0.35)
    n_rest = n - n_ground - n_obj
    g = np.empty((n_ground, 3), np.float32)
    r = 2.0 + 70.0 * rng.uniform(0, 1, n_ground) ** 2
    th = rng.uniform(-np.pi, np.pi, n_ground)
    g[:, 0], g[:, 1] = r * np.cos(th), r * np.sin(th)
    g[:, 2] = -7.7 + np.abs(rng.normal(0, 0.05, n_ground))
    centers = rng.uniform(-60, 60, (60, 2))
    idx = rng.integers(0, 60, n_obj)
    o = np.empty((n_obj, 3), np.float32)
    o[:, :2] = centers[idx] + rng.normal(0, 1.2, (n_obj, 2))
    o[:, 2] = rng.uniform(-7.7, -4.5, n_obj)
    rst = np.empty((n_rest, 3), np.float32)
    rst[:, :2] = rng.uniform(-72, 72, (n_rest, 2))
    rst[:, 2] = rng.uniform(-8, 0, n_rest)
    xyz = np.concatenate([g, o, rst]).astype(np.float32)
    extra = np.concatenate(
        [rng.uniform(0, 1, (n, 1)), np.zeros((n, 1))], axis=1
    ).astype(np.float32)
    return np.concatenate([xyz, extra], axis=1)


def main():
    from cmtcoop_tpu.ops.voxelize import voxelize, hard_simple_vfe
    from cmtcoop_tpu.ops import pillars as pu

    dtype = jnp.bfloat16
    pc_range = (-72.0, -72.0, -8.0, 72.0, 72.0, 0.0)
    grid = (1440, 1440, 40)
    pts = jnp.asarray(realistic_cloud())
    msk = jnp.ones((pts.shape[0],), bool)
    vox = jax.jit(lambda p, m: voxelize(
        p, m, voxel_size=(0.1, 0.1, 0.2), pc_range=pc_range,
        grid_size=grid, max_points=10, max_voxels=65536))(pts, msk)
    feats5 = hard_simple_vfe(vox)
    log(f"occupied voxels: {int(np.asarray(vox.mask).sum())}")

    P = 49152
    bp = jax.jit(lambda c, m, f: pu.build_pillars(
        c, m, f, (1440, 1440), 41, P))
    timeit(bp, vox.coords, vox.mask, feats5, name="build_pillars_49k")
    pcoords, pmask, occ, pfeats5 = bp(vox.coords, vox.mask, feats5)
    pgrid = pu.PillarGrid(pcoords, pmask, (1440, 1440), 41)
    n_pil = int(np.asarray(pmask).sum())
    log(f"active pillars: {n_pil}")

    nbr_fn = jax.jit(lambda c, m: pu.pillar_neighbor_map(
        pu.PillarGrid(c, m, (1440, 1440), 41)))
    timeit(nbr_fn, pcoords, pmask, name="nbr_map_49k")
    nbr = np.asarray(nbr_fn(pcoords, pmask))

    # window span stats for a fused kernel, several block sizes
    valid = nbr < P
    nbrv = np.where(valid, nbr, 2**31 - 1)
    nbrlo = np.where(valid, nbr, -1)
    for blk in (128, 256, 512):
        nb = P // blk
        lo = nbrv.reshape(nb, blk, 9).min(axis=(1, 2))
        hi = nbrlo.reshape(nb, blk, 9).max(axis=(1, 2))
        span = np.where(hi >= 0, hi - np.minimum(lo, hi) + 1, 0)
        log(f"block={blk}: span p50={np.percentile(span,50):.0f} "
            f"p95={np.percentile(span,95):.0f} p99={np.percentile(span,99):.0f} "
            f"max={span.max()}")

    rng = np.random.default_rng(0)
    shapes = [("s0", P, 41, 16, 16), ("s1", 24576, 21, 32, 32),
              ("s2", 16384, 11, 64, 64), ("s3", 16384, 5, 128, 128)]
    for tag, p, z, cin, cout in shapes:
        feats = jnp.asarray(
            rng.normal(size=(p, z, cin)).astype(np.float32), dtype=dtype)
        w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32),
                        dtype=dtype)
        # synthetic subm nbr with realistic structure: reuse stage-0 map
        # pattern scaled down (indices mod p)
        nb_t = jnp.asarray(np.where(nbr[:p] < P, nbr[:p] % p, p)
                           .astype(np.int32))

        v0 = jax.jit(lambda f, n, w_: pu.pillar_conv(f, n, w_, 3, 1, 1))
        timeit(v0, feats, nb_t, w, name=f"{tag}_v0_current")

        def v1(f, n, w_):
            p_, z_, c_ = f.shape
            padded = jnp.concatenate(
                [f, jnp.zeros((1, z_, c_), f.dtype)], 0)
            zp = jnp.zeros((p_ + 1, 1, c_), f.dtype)
            padded = jnp.concatenate([zp, padded, zp], 1)
            w4 = w_.reshape(3, 9, c_, -1)
            acc = None
            for j in range(9):
                x = padded[n[:, j]]
                y = jax.lax.conv_general_dilated(
                    x, w4[:, j], (1,), "VALID",
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
            return acc.astype(f.dtype)
        timeit(jax.jit(v1), feats, nb_t, w, name=f"{tag}_v1_peroffset")

        def v3(f, n, w_, blk=256, win=2048):
            p_, z_, c_ = f.shape
            padded = jnp.concatenate(
                [f, jnp.zeros((1, z_, c_), f.dtype)], 0)
            zp = jnp.zeros((p_ + 1, 1, c_), f.dtype)
            padded = jnp.concatenate([zp, padded, zp], 1)
            rows = padded.reshape(p_ + 1, -1)  # (P+1, (Z+2)*C)
            nb_ = p_ // blk
            nblk = n.reshape(nb_, blk, 9)
            start = jnp.min(jnp.where(nblk == p_, p_, nblk),
                            axis=(1, 2)).astype(jnp.int32)
            start = jnp.minimum(start, p_ + 1 - win)
            start = jnp.maximum(start, 0)
            local = nblk - start[:, None, None]
            local = jnp.where((nblk == p_) | (local < 0) | (local >= win),
                              win, local)
            rows_pad = jnp.concatenate(
                [rows, jnp.zeros((win, rows.shape[1]), rows.dtype)], 0)
            windows = jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    rows_pad, (s, 0), (win, rows.shape[1])))(start)
            # one-hot gather: (nb, blk*9, win) @ (nb, win, ZC)
            oh = (local.reshape(nb_, blk * 9)[:, :, None] ==
                  jnp.arange(win, dtype=jnp.int32)[None, None, :]
                  ).astype(f.dtype)
            tiles = jnp.einsum("bqw,bwc->bqc", oh, windows,
                               preferred_element_type=jnp.float32)
            tiles = tiles.astype(f.dtype).reshape(p_, 9, z_ + 2, c_)
            x = tiles.transpose(0, 2, 1, 3).reshape(p_, z_ + 2, 9 * c_)
            w3 = w_.reshape(3, 9 * c_, -1)
            out = jax.lax.conv_general_dilated(
                x, w3, (1,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32)
            return out.astype(f.dtype)
        timeit(jax.jit(v3), feats, nb_t, w, name=f"{tag}_v3_onehot")

        def v5(f, n, w_):
            p_, z_, c_ = f.shape
            padded = jnp.concatenate(
                [f, jnp.zeros((1, z_, c_), f.dtype)], 0)
            zp = jnp.zeros((p_ + 1, 1, c_), f.dtype)
            padded = jnp.concatenate([zp, padded, zp], 1)
            tiles = padded[n]  # (P, 9, Z+2, C)
            w4 = w_.reshape(3, 9, c_, -1)
            acc = None
            for dz in range(3):
                t = jax.lax.slice_in_dim(tiles, dz, dz + z_, axis=2)
                y = jnp.einsum("pjzc,jco->pzo", t, w4[dz],
                               preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
            return acc.astype(f.dtype)
        timeit(jax.jit(v5), feats, nb_t, w, name=f"{tag}_v5_flatdot")

    log("probe done")


if __name__ == "__main__":
    main()
