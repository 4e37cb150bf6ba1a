#!/usr/bin/env python
"""stem3 variants: 3x3 s2 conv 64->128 @ 4x320x800.

(a) direct stride-2
(b) half s2d: free reshape (w,64)->(w/2,128), 3x2 conv stride (2,1)
(c) full s2d: transpose to (h/2,w/2,256), 2x2 conv stride 1
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
    v, h, w, ci, co = 4, 320, 800, 64, 128
    log(f"==== probe_stem3 variants {v}x{h}x{w}x{ci}->{co} ====")
    fetch_overhead()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(v, h, w, ci)).astype(np.float32)
                    ).astype(DT)
    k = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32)
                    * 0.05)

    def out(y):
        y = jnp.maximum(y, 0.0).astype(DT)
        return y.astype(jnp.float32).sum() * 1e-20

    def direct(c, k_, x_):
        y = jax.lax.conv_general_dilated(
            x_ + c.astype(DT) * 0, k_.astype(DT), (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out(y)

    def half(c, k_, x_):
        xx = (x_ + c.astype(DT) * 0).reshape(v, h, w // 2, 2 * ci)
        k2 = jnp.zeros((3, 2, 2 * ci, co), k_.dtype)
        for dj in range(3):
            qb, qq = {0: (0, 1), 1: (1, 0), 2: (1, 1)}[dj]
            k2 = k2.at[:, qb, qq * ci:(qq + 1) * ci].set(k_[:, dj])
        y = jax.lax.conv_general_dilated(
            xx, k2.astype(DT), (2, 1), ((1, 1), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out(y)

    def full(c, k_, x_):
        xx = (x_ + c.astype(DT) * 0).reshape(v, h // 2, 2, w // 2, 2, ci)
        xx = jnp.transpose(xx, (0, 1, 3, 2, 4, 5)).reshape(
            v, h // 2, w // 2, 4 * ci)
        m = {0: (0, 1), 1: (1, 0), 2: (1, 1)}
        k2 = jnp.zeros((2, 2, 4 * ci, co), k_.dtype)
        for di in range(3):
            pb, pp = m[di]
            for dj in range(3):
                qb, qq = m[dj]
                k2 = k2.at[pb, qb, (pp * 2 + qq) * ci:(pp * 2 + qq + 1) * ci
                           ].set(k_[di, dj])
        y = jax.lax.conv_general_dilated(
            xx, k2.astype(DT), (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return out(y)

    a = jax.jit(lambda k_, x_: direct(jnp.zeros(()), k_, x_))(k, x)
    b = jax.jit(lambda k_, x_: half(jnp.zeros(()), k_, x_))(k, x)
    c = jax.jit(lambda k_, x_: full(jnp.zeros(()), k_, x_))(k, x)
    log(f"  parity sums: direct={a:.6e} half={b:.6e} full={c:.6e}")
    loop_time(direct, k, x, name="  stem3 direct s2", n=50)
    loop_time(half, k, x, name="  stem3 s2d half", n=50)
    loop_time(full, k, x, name="  stem3 s2d full", n=50)


if __name__ == "__main__":
    main()
