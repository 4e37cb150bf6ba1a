#!/usr/bin/env python
"""Micro-probe: stem1 (3x3 s2 conv, 3->64 @ 4x640x1600) variants.

(a) direct stride-2 XLA conv (original)
(b) full space-to-depth (transpose + 2x2 s1 conv over 12ch)
(c) half s2d: free reshape (w,3)->(w/2,6), 3x2 conv stride (2,1) over 6ch
Appends to runs/tpu_probe.log.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.tpu_probe import fetch_overhead, log, loop_time  # noqa: E402

DT = jnp.bfloat16


def main():
    v, h, w = 4, 640, 1600
    log(f"==== probe_stem1 variants {v}x{h}x{w} ====")
    fetch_overhead()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(v, h, w, 3)).astype(np.float32)
                    ).astype(DT)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 64)).astype(np.float32))

    def direct(c, k_, x_):
        y = jax.lax.conv_general_dilated(
            x_ + c.astype(DT) * 0, k_.astype(DT), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y, 0.0).astype(DT).astype(jnp.float32).sum() * 1e-20

    def s2d_full(c, k_, x_):
        xx = (x_ + c.astype(DT) * 0).reshape(v, h // 2, 2, w // 2, 2, 3)
        xx = jnp.transpose(xx, (0, 1, 3, 2, 4, 5)).reshape(
            v, h // 2, w // 2, 12)
        m = {0: (0, 1), 1: (1, 0), 2: (1, 1)}
        k2 = jnp.zeros((2, 2, 12, 64), k_.dtype)
        for di in range(3):
            pb, pp = m[di]
            for dj in range(3):
                qb, qq = m[dj]
                k2 = k2.at[pb, qb, (pp * 2 + qq) * 3:(pp * 2 + qq) * 3 + 3
                           ].set(k_[di, dj])
        y = jax.lax.conv_general_dilated(
            xx, k2.astype(DT), (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y, 0.0).astype(DT).astype(jnp.float32).sum() * 1e-20

    def s2d_half(c, k_, x_):
        xx = (x_ + c.astype(DT) * 0).reshape(v, h, w // 2, 6)
        # output col j reads orig cols 2j-1, 2j, 2j+1 -> blocks (j-1, ph1),
        # (j, ph0), (j, ph1); kw=2 with left pad 1
        k2 = jnp.zeros((3, 2, 6, 64), k_.dtype)
        for dj in range(3):
            qb, qq = {0: (0, 1), 1: (1, 0), 2: (1, 1)}[dj]
            k2 = k2.at[:, qb, qq * 3:qq * 3 + 3].set(k_[:, dj])
        y = jax.lax.conv_general_dilated(
            xx, k2.astype(DT), (2, 1), ((1, 1), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y, 0.0).astype(DT).astype(jnp.float32).sum() * 1e-20

    # parity check on CPU semantics first (all on device, compare values)
    a = jax.jit(lambda k_, x_: direct(jnp.zeros(()), k_, x_))(k, x)
    b = jax.jit(lambda k_, x_: s2d_full(jnp.zeros(()), k_, x_))(k, x)
    c = jax.jit(lambda k_, x_: s2d_half(jnp.zeros(()), k_, x_))(k, x)
    log(f"  parity sums: direct={a:.6e} s2d={b:.6e} half={c:.6e}")

    loop_time(direct, k, x, name="  stem1 direct s2", n=50)
    loop_time(s2d_full, k, x, name="  stem1 s2d full", n=50)
    loop_time(s2d_half, k, x, name="  stem1 s2d half", n=50)


if __name__ == "__main__":
    main()
