#!/usr/bin/env python
"""On-TPU verification of in-kernel flash-attention dropout.

The interpret path has no PRNG lowering, so the test suite (CPU) cannot
check the dropout math — this probe runs it on the real chip:
  1. determinism: same seed -> bit-identical outputs
  2. statistics: keep fraction ~= 1-rate; expectation over seeds ~= the
     dropout-free output
  3. fwd/bwd mask consistency: a dump kernel regenerates the keep mask
     with the SAME per-tile seeding; the XLA reference with that explicit
     mask must match both the forward kernel and the blocked backward.
Appends to runs/tpu_probe.log.  Exit code 0 iff all checks pass.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cmtcoop_tpu.ops.attention import (  # noqa: E402
    _dropout_keep, _seed_tile, flash_attention_diff, mha_reference)
from tools.tpu_probe import log  # noqa: E402


def dump_keep_mask(bh, nq, nk, block_q, block_k, seed, rate):
    """Regenerate the (bh, nq, nk) keep/(1-rate) factors exactly as the
    flash kernels do (same per-tile seeds, same block decomposition)."""
    def kern(seed_ref, o_ref, *, rate):
        _seed_tile(seed_ref, pl.program_id(0), pl.program_id(1),
                   pl.program_id(2), pl.num_programs(1),
                   pl.num_programs(2))
        o_ref[0] = _dropout_keep((o_ref.shape[1], o_ref.shape[2]), rate)

    return pl.pallas_call(
        functools.partial(kern, rate=rate),
        grid=(bh, nq // block_q, nk // block_k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, block_q, block_k),
                               lambda b, i, j: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, nk), jnp.float32),
    )(jnp.asarray(seed, jnp.int32).reshape(1))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    log("==== probe_flash_dropout (on-chip PRNG checks) ====")
    rng = np.random.default_rng(0)
    b, h, nq, nk, d = 1, 4, 256, 2048, 32
    bq, bk, rate = 128, 512, 0.1
    q = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
    kb = np.zeros((b, nk), np.float32)
    kb[:, -300:] = -1e9
    kb = jnp.asarray(kb)
    seed = jnp.asarray([1234], jnp.int32)
    fails = []

    def flash(s, r):
        return flash_attention_diff(q, k, v, kb, s, bq, bk, False, r)

    # 1. determinism
    o1 = np.asarray(flash(seed, rate))
    o2 = np.asarray(flash(seed, rate))
    det = np.array_equal(o1, o2)
    log(f"  determinism (same seed, bitwise): {det}")
    if not det:
        fails.append("determinism")

    # 2. statistics
    keep = np.asarray(dump_keep_mask(b * h, nq, nk, bq, bk, seed, rate))
    frac = float((keep > 0).mean())
    log(f"  keep fraction: {frac:.4f} (target {1 - rate:.4f})")
    if abs(frac - (1 - rate)) > 3e-3:
        fails.append("keep fraction")
    base = np.asarray(flash(seed, 0.0))
    n_seeds = 128
    outs = np.stack([np.asarray(flash(jnp.asarray([s], jnp.int32), rate))
                     for s in range(n_seeds)])
    rel = np.abs(outs.mean(0) - base).mean() / (np.abs(base).mean() + 1e-9)
    # pure sampling noise: per-element std of a rate-0.1 inverted-dropout
    # mean over n_seeds is ~sqrt(r/(1-r))/sqrt(n) of the summand scale
    log(f"  E[dropout out] vs dropout-free: rel err {rel:.4f} "
        f"({n_seeds} seeds)")
    if rel > 0.04:
        fails.append("expectation")

    # 3. fwd/bwd vs XLA reference with the dumped mask
    keep_bhqk = jnp.asarray(keep).reshape(b, h, nq, nk)

    def ref_with_mask(q_, k_, v_, kb_):
        dh = q_.shape[-1]
        logits = jnp.einsum("bhqd,bhkd->bhqk", q_, k_,
                            preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(dh) + kb_[:, None, None, :]
        p = jax.nn.softmax(logits, axis=-1) * keep_bhqk
        return jnp.einsum("bhqk,bhkd->bhqd", p, v_,
                          preferred_element_type=jnp.float32)

    tgt = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
    ref_out = np.asarray(ref_with_mask(q, k, v, kb))
    err_f = np.abs(o1 - ref_out).max()
    # a wrong/shifted mask would put O(1) errors here (dropped vs kept
    # entries differ by whole V rows); the residual is TPU f32 matmul
    # emulation (bf16x3) divergence between the kernel and XLA einsums
    log(f"  forward vs explicit-mask reference: max err {err_f:.2e}")
    if err_f > 3e-3:
        fails.append("forward vs mask-reference")

    g_f = jax.grad(
        lambda *a: jnp.sum((flash_attention_diff(
            *a, seed, bq, bk, False, rate) - tgt) ** 2),
        argnums=(0, 1, 2, 3))(q, k, v, kb)
    g_r = jax.grad(
        lambda *a: jnp.sum((ref_with_mask(*a) - tgt) ** 2),
        argnums=(0, 1, 2, 3))(q, k, v, kb)
    for gf, gr, name in zip(g_f, g_r, ("dq", "dk", "dv", "dkb")):
        scale = float(jnp.abs(gr).max()) + 1e-9
        e = float(jnp.abs(gf - gr).max()) / scale
        log(f"  blocked bwd {name} vs explicit-mask reference: "
            f"rel max err {e:.2e}")
        if e > 2e-2:  # chained TPU f32 (bf16x3) matmuls; exact-math
            fails.append(f"bwd {name}")  # parity is the CPU interpret test

    if fails:
        log(f"  FAILED: {fails}")
        sys.exit(1)
    log("  all dropout checks passed")


if __name__ == "__main__":
    main()
