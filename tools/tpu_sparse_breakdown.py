#!/usr/bin/env python
"""Fine-grained sparse-encoder breakdown on TPU -> runs/sparse_breakdown.log.

Measures: relay fixed overhead, subm neighbor map, gather_conv (combined vs
per-offset monotonic gathers), downsample grid, masked BN — to find where the
1.9s sparse encoder goes.
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
    os.path.abspath(__file__))), "runs", "sparse_breakdown.log"), "a", 1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def timeit(fn, *args, iters=5, name=""):
    t0 = time.time()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    log(f"{name}: compile {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    log(f"{name}: {(time.time() - t0) / iters * 1e3:.1f} ms")


def main():
    from cmtcoop_tpu.ops import sparse_utils as su

    rng = np.random.default_rng(0)
    SHAPE = (41, 1440, 1440)
    V = 120000

    d, h, w = SHAPE
    lin = np.sort(rng.choice(d * h * w, V, replace=False).astype(np.int64))
    coords = np.stack(
        [lin // (h * w), (lin // w) % h, lin % w], -1).astype(np.int32)
    coords_j = jnp.asarray(coords)
    mask_j = jnp.ones((V,), bool)

    # 0) relay fixed overhead
    trivial = jax.jit(lambda x: x + 1.0)
    xsmall = jnp.ones((8, 128))
    timeit(trivial, xsmall, iters=10, name="relay_roundtrip")

    # 1) subm neighbor map
    nbr_fn = jax.jit(lambda c, m: su.subm_neighbor_map(
        su.SparseGrid(c, m, SHAPE)))
    timeit(nbr_fn, coords_j, mask_j, name=f"subm_map_V{V}")
    nbr = nbr_fn(coords_j, mask_j)

    # 2) gather_conv combined, several channel widths
    for cin, cout in ((16, 16), (64, 64), (128, 128)):
        feats = jnp.asarray(rng.normal(size=(V, cin)).astype(np.float32),
                            dtype=jnp.bfloat16)
        wts = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(
            np.float32), dtype=jnp.bfloat16)
        comb = jax.jit(lambda f, n, w_: su.gather_conv(f, n, w_))
        timeit(comb, feats, nbr, wts, name=f"gather_conv_comb_c{cin}")

        def per_offset(f, n, w_):
            padded = jnp.concatenate(
                [f, jnp.zeros((1, f.shape[1]), f.dtype)], 0)
            acc = jnp.zeros((f.shape[0], w_.shape[-1]), jnp.float32)
            for k in range(27):
                acc += jax.lax.dot_general(
                    padded[n[:, k]], w_[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return acc.astype(f.dtype)
        po = jax.jit(per_offset)
        timeit(po, feats, nbr, wts, name=f"gather_conv_peroff_c{cin}")

    # 3) downsample grid + conv map
    def down(c, m):
        g = su.SparseGrid(c, m, SHAPE)
        og = su.downsample_output_grid(g, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                       60000)
        nb = su.conv_neighbor_map(g, og, (3, 3, 3), (2, 2, 2), (1, 1, 1))
        return og.coords, nb
    timeit(jax.jit(down), coords_j, mask_j, name="downsample_V120k")

    log("done")


if __name__ == "__main__":
    main()
