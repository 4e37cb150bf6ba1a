#!/usr/bin/env python
"""Attribute the VoVNet stem: stem1 / to_cf / stem2(cf) / from_cf / stem3
individually and composed variants (all-XLA stem vs cf-stem2 stem).
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
from cmtcoop_tpu.ops.conv_cf import conv3x3_cf, from_cf, to_cf  # noqa: E402

DT = jnp.bfloat16


def conv_xla(x, k, stride, relu=True):
    y = jax.lax.conv_general_dilated(
        x, k.astype(DT), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(DT)


def main():
    v, h, w = 4, 640, 1600
    log(f"==== probe_stem_parts {v}x{h}x{w} ====")
    fetch_overhead()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(v, h, w, 3)).astype(np.float32)
                     ).astype(DT)
    k1 = jnp.asarray(rng.normal(size=(3, 3, 3, 64)).astype(np.float32))
    k2 = jnp.asarray(
        rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.05)
    k3 = jnp.asarray(
        rng.normal(size=(3, 3, 64, 128)).astype(np.float32) * 0.05)
    sc = jnp.ones((64,), jnp.float32)
    bi = jnp.zeros((64,), jnp.float32)

    def sum_out(y):
        return y.astype(jnp.float32).sum() * 1e-20

    def stem_allxla(c, ks, x_):
        k1_, k2_, k3_ = ks
        x = conv_xla(x_ + c.astype(DT) * 0, k1_, 2)
        x = conv_xla(x, k2_, 1)
        x = conv_xla(x, k3_, 2)
        return sum_out(x)

    def stem_cf2(c, ks, x_):
        k1_, k2_, k3_ = ks
        x = conv_xla(x_ + c.astype(DT) * 0, k1_, 2)
        xf = to_cf(x, 8)
        xf = conv3x3_cf(xf, k2_.astype(DT), h // 2, w // 2,
                        scale=sc, bias=bi, relu=True, rt=8)
        x = from_cf(xf, h // 2, w // 2)
        x = conv_xla(x, k3_, 2)
        return sum_out(x)

    def to_cf_only(c, ks, x_):
        x = conv_xla(x_ + c.astype(DT) * 0, ks[0], 2)
        return sum_out(to_cf(x, 8))

    def stem12_xla(c, ks, x_):
        x = conv_xla(x_ + c.astype(DT) * 0, ks[0], 2)
        return sum_out(conv_xla(x, ks[1], 1))

    ks = (k1, k2, k3)
    loop_time(stem_allxla, ks, x0, name="  stem all-XLA", n=30)
    loop_time(stem_cf2, ks, x0, name="  stem cf-stem2", n=30)
    loop_time(to_cf_only, ks, x0, name="  stem1+to_cf", n=30)
    loop_time(stem12_xla, ks, x0, name="  stem1+stem2 XLA", n=30)


if __name__ == "__main__":
    main()
