#!/usr/bin/env python
"""A/B XLA variants of sorted_lookup's windowed compare-count at L0 bench
shapes (38400 sorted queries, run=3, window 256)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.tpu_probe import bench_cloud, fetch_overhead, log, loop_time  # noqa: E402
from cmtcoop_tpu.ops.pillars import pillarize  # noqa: E402
from cmtcoop_tpu.ops.sparse_utils import INT32_MAX  # noqa: E402

WINDOW = 256
RUN = 3
BLOCK = 128


def ieps(c):
    return (c * 1e-30).astype(jnp.int32)


def plan(keys, queries):
    n = queries.shape[0]
    nk = keys.shape[0]
    nb = n // BLOCK
    q_blocks = queries.reshape(nb, BLOCK)
    starts = jnp.searchsorted(
        keys, q_blocks[:, 0], side="left").astype(jnp.int32)
    keys_pad = jnp.concatenate(
        [keys, jnp.full((WINDOW,), INT32_MAX, keys.dtype)])
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(keys_pad, (s,), (WINDOW,))
    )(starts)
    return q_blocks, starts, windows


def main():
    log("==== probe_lookup2 (count variants, L0) ====")
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

    def v_scan(c, keys, queries):
        """Current impl: scan over 2 chunks of 128, 4 counts."""
        qb, starts, windows = plan(keys + ieps(c), queries)
        chunk = 128

        def body(carry, i):
            wc = jax.lax.dynamic_slice_in_dim(
                windows, i * chunk, chunk, axis=1)
            return tuple(
                cc + jnp.sum(wc[:, None, :] < qb[:, :, None] + d, axis=-1,
                             dtype=jnp.int32)
                for d, cc in enumerate(carry)), None
        zeros = jnp.zeros(qb.shape, jnp.int32)
        counts, _ = jax.lax.scan(
            body, (zeros,) * (RUN + 1), jnp.arange(WINDOW // chunk))
        return sum(jnp.sum(cc) for cc in counts).astype(
            jnp.float32) * 1e-20

    def v_direct(c, keys, queries):
        """No scan: one fused broadcast-compare-reduce per d."""
        qb, starts, windows = plan(keys + ieps(c), queries)
        counts = [
            jnp.sum(windows[:, None, :] < qb[:, :, None] + d, axis=-1,
                    dtype=jnp.int32)
            for d in range(RUN + 1)]
        return sum(jnp.sum(cc) for cc in counts).astype(
            jnp.float32) * 1e-20

    def v_eq(c, keys, queries):
        """lt(0) + eq(d) for d in 0..run-1: counts[d] via prefix sums."""
        qb, starts, windows = plan(keys + ieps(c), queries)
        lt0 = jnp.sum(windows[:, None, :] < qb[:, :, None], axis=-1,
                      dtype=jnp.int32)
        acc = lt0
        tot = jnp.sum(lt0)
        for d in range(RUN):
            eq = jnp.sum(windows[:, None, :] == qb[:, :, None] + d,
                         axis=-1, dtype=jnp.int32)
            acc = acc + eq
            tot = tot + jnp.sum(acc)
        return tot.astype(jnp.float32) * 1e-20

    def v_bf16(c, keys, queries):
        """Compare in int32 but accumulate via f32 sums (VPU fma)."""
        qb, starts, windows = plan(keys + ieps(c), queries)
        counts = [
            jnp.sum((windows[:, None, :] < qb[:, :, None] + d).astype(
                jnp.float32), axis=-1)
            for d in range(RUN + 1)]
        return sum(jnp.sum(cc) for cc in counts).astype(
            jnp.float32) * 1e-20

    for name, fn in (("scan(current)", v_scan), ("direct", v_direct),
                     ("lt+eq", v_eq), ("f32 sums", v_bf16)):
        loop_time(fn, lin, base, name=f"  count {name}")


if __name__ == "__main__":
    main()
