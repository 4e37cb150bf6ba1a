#!/usr/bin/env python
"""Dissect decoder latency at the bench shape (6L, 1024 q, 44.4k KV,
8 heads x d32, bf16): flash kernel block sizes, kv projections, one full
layer, softmax/VPU share. Appends to runs/tpu_probe.log.
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
from cmtcoop_tpu.ops.attention import flash_attention_kvmask  # noqa: E402

DT = jnp.bfloat16
NQ, NK, H, DH, C = 1024, 45056, 8, 32, 256


def main():
    log("==== probe_decoder breakdown ====")
    fetch_overhead()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, H, NQ, DH)) * 0.1, DT)
    k = jnp.asarray(rng.normal(size=(1, H, NK, DH)) * 0.1, DT)
    v = jnp.asarray(rng.normal(size=(1, H, NK, DH)) * 0.1, DT)
    kb = jnp.zeros((1, NK), jnp.float32)

    def mk(bq, bk):
        def f(c, q_, k_, v_):
            o = flash_attention_kvmask(
                q_ + (c * 1e-30).astype(DT), k_, v_, kb,
                block_q=bq, block_k=bk)
            return o.astype(jnp.float32).sum() * 1e-20
        return f

    for bq, bk in ((256, 2048), (512, 2048), (1024, 2048), (512, 4096),
                   (256, 4096), (1024, 1024)):
        try:
            loop_time(mk(bq, bk), q, k, v,
                      name=f"  flash bq{bq} bk{bk}", n=50)
        except Exception as e:  # VMEM OOM etc.
            log(f"  flash bq{bq} bk{bk}: FAILED {type(e).__name__}")

    # kv projections of the memory (per layer cost x6)
    mem = jnp.asarray(rng.normal(size=(1, NK, C)) * 0.1, DT)
    wk = jnp.asarray(rng.normal(size=(C, C)) * 0.05, DT)

    def proj(c, m, w):
        return ((m + (c * 1e-30).astype(DT)) @ w).astype(
            jnp.float32).sum() * 1e-20
    loop_time(proj, mem, wk, name="  memory kv proj 44.4k x 256x256", n=50)

    # memory + pos add (per layer)
    pos = jnp.asarray(rng.normal(size=(1, NK, C)) * 0.1, DT)

    def add(c, m, p):
        return (m + p + (c * 1e-30).astype(DT)).astype(
            jnp.float32).sum() * 1e-20
    loop_time(add, mem, pos, name="  memory + pos add", n=50)

    # one full decoder layer (eval)
    from cmtcoop_tpu.models.petr_decoder import PETRDecoderLayer
    layer = PETRDecoderLayer(dtype=DT)
    qq = jnp.asarray(rng.normal(size=(1, NQ, C)) * 0.1, DT)
    qpos = jnp.asarray(rng.normal(size=(1, NQ, C)) * 0.1, DT)
    params = jax.jit(layer.init)(jax.random.PRNGKey(0), qq, mem, qpos,
                                 pos, None, None)

    def lf(c, pr, qq_, mem_):
        o = layer.apply(pr, qq_ + (c * 1e-30).astype(DT), mem_, qpos, pos,
                        None, None)
        return o.astype(jnp.float32).sum() * 1e-20
    loop_time(lf, params, qq, mem, name="  full decoder layer", n=30)

    # self-attn-only shape (1024 x 1024)
    q2 = jnp.asarray(rng.normal(size=(1, H, NQ, DH)) * 0.1, DT)

    def selfa(c, q_, k_):
        import math
        s = jnp.einsum("bhqd,bhkd->bhqk", q_ + (c * 1e-30).astype(DT), k_,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s / math.sqrt(DH), axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(DT), k_,
                       preferred_element_type=jnp.float32)
        return o.sum() * 1e-20
    loop_time(selfa, q2, q2, name="  self-attn 1024x1024 XLA", n=50)


if __name__ == "__main__":
    main()
