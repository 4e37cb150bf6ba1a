#!/usr/bin/env python
"""Micro-attribution of sorted_lookup / downsample-grid cost at L0 bench
shapes: is it the two jnp.searchsorted calls (latency-bound bisection
gathers), the windowed compare-count, or the sort?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.tpu_probe import fetch_overhead, log, loop_time  # noqa: E402
from cmtcoop_tpu.ops.pillars import pillarize  # noqa: E402
from cmtcoop_tpu.ops.sparse_utils import INT32_MAX, sorted_lookup  # noqa: E402


def ieps(c):
    return (c * 1e-30).astype(jnp.int32)


def main():
    from tools.tpu_probe import bench_cloud
    log("==== probe_lookup (L0 bench shapes) ====")
    fetch_overhead()
    pts, msk = bench_cloud()
    pc, pm, occ, x = jax.jit(lambda p, m: pillarize(
        p, m, voxel_size=(0.1, 0.1, 0.2),
        pc_range=(-72.0, -72.0, -8.0, 72.0, 72.0, 0.0),
        grid_size=(1440, 1440, 40), max_points=10,
        max_voxels=65536, max_pillars=38400))(pts, msk)
    w = 1440
    lin = jnp.where(pm, pc[:, 0] * w + pc[:, 1], INT32_MAX)
    base = jnp.where(pm, lin - w - 1, INT32_MAX)

    for blk, win in ((128, 256), (256, 384), (512, 640), (1024, 1152)):
        def full(c, lin, base, blk=blk, win=win):
            pos, hit, ovf = sorted_lookup(
                lin + ieps(c), base, run=3, window=win, block=blk,
                return_overflow=True)
            return (jnp.sum(pos) + jnp.sum(hit) + ovf).astype(
                jnp.float32) * 1e-20
        loop_time(full, lin, base,
                  name=f"  sorted_lookup run3 blk{blk} win{win} 38400q")

    def ss(c, lin, base):
        heads = base.reshape(-1, 128)[:, 0]
        pos = jnp.searchsorted(lin + ieps(c), heads, side="left")
        return jnp.sum(pos).astype(jnp.float32) * 1e-20
    loop_time(ss, lin, base, name="  searchsorted 300 block heads")

    def ss2(c, lin, base):
        heads = base.reshape(-1, 128)[:, 0]
        pos = jnp.searchsorted(lin + ieps(c), heads, side="left")
        q_last = jnp.max(base.reshape(-1, 128), axis=1)
        ends = jnp.searchsorted(lin + ieps(c), q_last + 2, side="right")
        return (jnp.sum(pos) + jnp.sum(ends)).astype(jnp.float32) * 1e-20
    loop_time(ss2, lin, base, name="  2x searchsorted (starts+ends)")

    def srt(c, lin):
        s = jnp.sort(jnp.tile(lin + ieps(c), 4))
        return jnp.sum(s).astype(jnp.float32) * 1e-20
    loop_time(srt, lin, name="  jnp.sort 153k int32")


if __name__ == "__main__":
    main()
