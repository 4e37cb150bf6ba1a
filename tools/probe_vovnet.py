#!/usr/bin/env python
"""Dissect VoVNet TPU efficiency: which of lane padding / concat
materialization / BN+eSE composition / XLA conv lowering costs the time.
Appends to runs/tpu_probe.log.
"""
import os
import sys
import time

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


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(DT)


def bench_conv(n, h, w_, cin, cout, name, n_iter=30, stride=1, k=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w_, cin)), DT)
    wt = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.05, DT)
    flops = n * (h // stride) * (w_ // stride) * cin * cout * k * k * 2

    def f(c, x_, wt_):
        return conv(x_ + (c * 1e-30).astype(DT), wt_, stride).astype(
            jnp.float32).sum() * 1e-20
    ms = loop_time(f, x, wt, name=f"  {name}", n=n_iter)
    log(f"    -> {flops / ms * 1e-9:.1f} GFLOP/ms = "
        f"{flops / ms * 1e-9 / 197:.1%} of bf16 peak")
    return ms


def main():
    log("==== probe_vovnet ====")
    fetch_overhead()
    rng = np.random.default_rng(0)

    # isolated convs at each stage's hot shape (4 views)
    bench_conv(4, 160, 400, 128, 128, "s2 conv 128->128 @160x400")
    bench_conv(4, 80, 200, 160, 160, "s3 conv 160->160 @80x200")
    bench_conv(4, 80, 200, 256, 256, "s3 conv 256->256 (lane-padded ch)")
    bench_conv(4, 40, 100, 192, 192, "s4 conv 192->192 @40x100")
    bench_conv(4, 40, 100, 256, 256, "s4 conv 256->256 (padded)")
    bench_conv(4, 20, 50, 224, 224, "s5 conv 224->224 @20x50")
    # batch-folded variants: collapse views into H
    bench_conv(1, 4 * 80, 200, 160, 160, "s3 conv N-folded @320x200")
    bench_conv(1, 4 * 40, 100, 192, 192, "s4 conv N-folded @160x100")
    # 1x1 agg conv at stage3/4 shapes
    bench_conv(4, 80, 200, 1056, 512, "s3 agg 1x1 1056->512", k=1)
    bench_conv(4, 40, 100, 1472, 768, "s4 agg 1x1 1472->768", k=1)
    # stem
    bench_conv(4, 640, 1600, 3, 64, "stem1 3->64 s2", stride=2)
    bench_conv(4, 320, 800, 64, 64, "stem2 64->64")
    bench_conv(4, 320, 800, 64, 128, "stem3 64->128 s2", stride=2)

    # full OSA block stage3 variants
    from cmtcoop_tpu.models.vovnet import OSAModule
    x3 = jnp.asarray(rng.normal(size=(4, 80, 200, 512)), DT)
    blk = OSAModule(160, 512, 5, identity=True, dtype=DT)
    pr = jax.jit(lambda k_, x_: blk.init(k_, x_, False))(
        jax.random.PRNGKey(0), x3)

    def osa(c, pr_, x_):
        return blk.apply(pr_, x_ + (c * 1e-30).astype(DT), False).astype(
            jnp.float32).sum() * 1e-20
    loop_time(osa, pr, x3, name="  OSA s3 block (full)", n=20)

    # OSA without eSE / without concat (sum-of-matmul agg)
    w_convs = [jnp.asarray(rng.normal(size=(3, 3, 512 if i == 0 else 160,
                                            160)) * 0.05, DT)
               for i in range(5)]
    w_aggs = [jnp.asarray(rng.normal(size=(1, 1, c, 512)) * 0.05, DT)
              for c in (512, 160, 160, 160, 160, 160)]

    def osa_split(c, x_, wc, wa):
        x_ = x_ + (c * 1e-30).astype(DT)
        outs = [x_]
        y = x_
        for i in range(5):
            y = jnp.maximum(conv(y, wc[i]), 0)
            outs.append(y)
        acc = None
        for o, w in zip(outs, wa):
            t = conv(o, w)
            acc = t if acc is None else acc + t
        return acc.astype(jnp.float32).sum() * 1e-20
    loop_time(osa_split, x3, w_convs, w_aggs,
              name="  OSA s3 split-agg (no concat, no BN/eSE)", n=20)

    def osa_cat(c, x_, wc, wa_cat):
        x_ = x_ + (c * 1e-30).astype(DT)
        outs = [x_]
        y = x_
        for i in range(5):
            y = jnp.maximum(conv(y, wc[i]), 0)
            outs.append(y)
        cat = jnp.concatenate(outs, axis=-1)
        return conv(cat, wa_cat).astype(jnp.float32).sum() * 1e-20
    wa_cat = jnp.concatenate(w_aggs, axis=2)
    loop_time(osa_cat, x3, w_convs, wa_cat,
              name="  OSA s3 concat-agg (no BN/eSE)", n=20)


if __name__ == "__main__":
    main()
