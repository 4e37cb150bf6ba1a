"""Pallas kernel for sorted_lookup's windowed compare-count.

Every neighbor map, downsample grid, rank lookup, and densify in the
pillar/voxel machinery bottoms out in `sorted_lookup`'s count of window
keys below each query (sparse_utils.py:34). This kernel does ONLY the
counting — window gathering, position/hit algebra, and the overflow guard
stay in XLA — so its correctness surface is one pure function,
oracle-tested against the XLA path.

MEASURED RESULT (v5e-1, L0 bench shapes, run=3, win=256, 38400 queries):
0.585 ms vs 0.417 ms for the unrolled XLA compare-count — the kernel LOSES
(per-grid-step int32 relayouts/transposes dominate; the compare itself is
VPU-bound either way). Kept as a measured, tested alternative; off by
default (sparse_utils.sorted_lookup(kernel=False)).

Layout: queries q (nb, 128) sorted per block; windows (nb, W) contiguous
key slices (sorted; padded with INT32_MAX). Output counts
(nb, (run+1)*128) int32 where counts[b, d*128+i] = #{w in window_b :
w < q[b, i] + d}. Sentinel queries (INT32_MAX) wrap on +d exactly like
the XLA path (count 0 for d >= 1; callers never read sentinel slots).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _count_kernel(q_ref, w_ref, o_ref, *, gsub, run, block):
    qt = q_ref[...].T  # (block, gsub): ONE relayout per grid step
    cols = []
    for g in range(gsub):
        qg = qt[:, g:g + 1]                      # (block, 1)
        wg = w_ref[g:g + 1, :]                   # (1, W)
        for d in range(run + 1):
            cols.append(jnp.sum(wg < qg + d, axis=1, keepdims=True,
                                dtype=jnp.int32))
    ct = jnp.concatenate(cols, axis=1).T  # (gsub*(run+1), block)
    for g in range(gsub):
        for d in range(run + 1):
            o_ref[g, d * block:(d + 1) * block] = \
                ct[g * (run + 1) + d]


@functools.partial(jax.jit, static_argnames=("run", "gsub", "interpret"))
def window_counts(q_blocks: jnp.ndarray, windows: jnp.ndarray,
                  run: int = 1, gsub: int = 8,
                  interpret: bool = False):
    """counts[b, :, i] for d in 0..run of keys-below-query per block.

    q_blocks (nb, 128) int32, windows (nb, W) int32 -> (nb, run+1, 128).
    """
    nb, block = q_blocks.shape
    w = windows.shape[1]
    pad = (-nb) % gsub
    if pad:
        q_blocks = jnp.pad(q_blocks, ((0, pad), (0, 0)))
        windows = jnp.pad(windows, ((0, pad), (0, 0)))
    nbp = q_blocks.shape[0]
    out = pl.pallas_call(
        functools.partial(_count_kernel, gsub=gsub, run=run, block=block),
        grid=(nbp // gsub,),
        in_specs=[
            pl.BlockSpec((gsub, block), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gsub, w), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gsub, (run + 1) * block),
                               lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbp, (run + 1) * block),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q_blocks, windows)
    return out[:nb].reshape(nb, run + 1, block)
