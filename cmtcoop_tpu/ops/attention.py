"""Attention kernels: XLA reference path + Pallas flash path.

The reference splits attention across two implementations because
flash-attn 0.2.2 cannot take masks (models/utils/attention.py:30-138,
petr_transformer.py:37-321): standard cuDNN MHA for DN-masked self-attention
and flash attention for the 900-query x ~50k-token cross-attention. Our
Pallas kernel supports an additive bias, unifying both paths (SURVEY §7.3 #5).

All functions take `q, k, v` of shape (B, H, N, Dh) and return (B, H, Nq, Dh).
`bias` is additive, broadcastable to (B, H, Nq, Nk); use -inf (or a large
negative) for blocked positions.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _dropout_keep(shape, rate):
    """In-kernel inverted-dropout keep factor for the CURRENT tile.

    Caller must have seeded the per-core PRNG with a tile-unique seed
    (`_seed_tile`); forward and backward regenerate identical bits for a
    tile as long as they use the same (block_q, block_k) decomposition.
    Returns keep/(1-rate) as f32 (0.0 for dropped entries).
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return (bits >= thresh).astype(jnp.float32) * (1.0 / (1.0 - rate))


def _seed_tile(seed_ref, b_idx, q_idx, kv_idx, n_q_blocks, n_k_blocks):
    """Seed the PRNG uniquely per (batch*head, q-block, kv-block) tile."""
    tid = (b_idx * n_q_blocks + q_idx) * n_k_blocks + kv_idx
    pltpu.prng_seed(seed_ref[0], tid)


def mha_reference(q, k, v, bias: Optional[jnp.ndarray] = None,
                  dropout_rate: float = 0.0, dropout_rng=None):
    """Plain XLA softmax attention (numerics oracle + small-N path).

    `dropout_rate` > 0 applies inverted dropout to the softmax weights —
    torch nn.MultiheadAttention's attn_drop semantics (dropout AFTER
    softmax, no renormalization), which the reference enables at 0.1 via
    the deprecated `dropout` kwarg (petr_transformer.py:68-82)."""
    dh = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(dh)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0:
        assert dropout_rng is not None
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32).astype(v.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, kmask_ref, *rest,
                  sm_scale, block_k, kv_len, with_stats, dropout_rate):
    """One (batch*head, q-block) program: stream KV blocks with online
    softmax. kmask is a per-key additive bias row (encodes KV padding).
    With `with_stats`, also emits the per-query running (m, l) so callers
    can merge partial attentions across KV shards (log-sum-exp combine).

    `dropout_rate > 0` applies inverted dropout to the NORMALIZED softmax
    weights in-kernel (torch attn_drop semantics, the reference's
    training-mode flash: attention.py:70-92 `self.dropout_p if
    self.training else 0.0`): the per-tile keep mask multiplies the
    accumulator contribution only — the normalizer l stays the full
    softmax sum, so out = dropout(P) @ V exactly. Seeded per tile, so the
    blocked backward regenerates identical bits."""
    it = iter(rest)
    seed_ref = next(it) if dropout_rate > 0.0 else None
    o_ref = next(it)
    ml_ref = next(it) if with_stats else None
    m_scr, l_scr, acc_scr = it
    kv_idx = pl.program_id(2)
    is_first = kv_idx == 0

    @pl.when(is_first)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)           # (bq, d)
    k = k_ref[0].astype(jnp.float32)           # (bk, d)
    v = v_ref[0].astype(jnp.float32)           # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (bq, bk)
    s = s + kmask_ref[0, 0][None, :]

    m_prev = m_scr[:]                           # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        _seed_tile(seed_ref, pl.program_id(0), pl.program_id(1), kv_idx,
                   pl.num_programs(1), pl.num_programs(2))
        pv = p * _dropout_keep(p.shape, dropout_rate)
    else:
        pv = p
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        pv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)
        if with_stats:
            ml_ref[0] = jnp.concatenate(
                [jnp.broadcast_to(m_scr[:], (m_scr.shape[0], 64)),
                 jnp.broadcast_to(l_scr[:], (l_scr.shape[0], 64))], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "with_stats",
                     "dropout_rate"))
def flash_attention_kvmask(q, k, v, k_bias, block_q: int = 128,
                           block_k: int = 1024, interpret: bool = False,
                           with_stats: bool = False,
                           dropout_rate: float = 0.0, seed=None):
    """Flash attention with a per-key additive bias (KV padding mask).

    Covers the reference's cross-attention use case (padding-only masking)
    with O(Nq*Dh) VMEM. Shapes: q (B,H,Nq,Dh), k/v (B,H,Nk,Dh),
    k_bias (B, Nk) additive (0 or NEG_INF).

    With `with_stats`, returns (out, m, l) where m/l are the per-query
    softmax running max and normalizer ((B,H,Nq) float32) — the sufficient
    statistics for merging attention over KV shards.

    `dropout_rate > 0` (train) applies inverted dropout to the softmax
    weights in-kernel, seeded by `seed` (int32 array (1,), required);
    TPU-only — the interpret path has no PRNG lowering.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    assert nq % block_q == 0 and nk % block_k == 0, (nq, nk)
    bh = b * h
    qr = q.reshape(bh, nq, d)
    kr = k.reshape(bh, nk, d)
    vr = v.reshape(bh, nk, d)
    biasr = jnp.broadcast_to(
        k_bias[:, None, :], (b, h, nk)).reshape(bh, 1, nk).astype(
            jnp.float32)

    grid = (bh, nq // block_q, nk // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
        pl.BlockSpec((1, 1, block_k), lambda b_, i, j: (b_, 0, j)),
    ]
    operands = [qr, kr, vr, biasr]
    if dropout_rate > 0.0:
        assert seed is not None, "dropout needs a seed"
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(seed, jnp.int32).reshape(1))
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0))]
    out_shapes = [jax.ShapeDtypeStruct((bh, nq, d), q.dtype)]
    if with_stats:
        out_specs.append(
            pl.BlockSpec((1, block_q, 128), lambda b_, i, j: (b_, i, 0)))
        out_shapes.append(
            jax.ShapeDtypeStruct((bh, nq, 128), jnp.float32))
    res = pl.pallas_call(
        functools.partial(
            _flash_kernel, sm_scale=1.0 / math.sqrt(d), block_k=block_k,
            kv_len=nk, with_stats=with_stats, dropout_rate=dropout_rate),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if with_stats else out_specs[0],
        out_shape=out_shapes if with_stats else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
    if with_stats:
        out, ml = res
        m = ml[:, :, 0].reshape(b, h, nq)
        l = ml[:, :, 64].reshape(b, h, nq)
        return out.reshape(b, h, nq, d), m, l
    return res.reshape(b, h, nq, d)


def _flash_kernel_packed(q_ref, k_ref, v_ref, kmask_ref, o_ref,
                         m_scr, l_scr, acc_scr, *, sm_scale, gh, dh):
    """Head-packed variant: grid (b, head_group, nq_b, nk_b). Each block
    carries a 128-lane group of `gh` heads sliced straight out of the
    (B, N, H*Dh) projection outputs (Pallas requires 128-divisible lane
    blocks), so no (B,H,N,Dh) transpose/copy of the ~45k-token KV is ever
    materialized. Per head: the same online softmax as `_flash_kernel`,
    with running (m, l) in per-head scratch columns."""
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    kmask = kmask_ref[0, 0][None, :]
    for s in range(gh):
        sl = slice(s * dh, (s + 1) * dh)
        q = q_ref[0, :, sl].astype(jnp.float32)
        k = k_ref[0, :, sl].astype(jnp.float32)
        v = v_ref[0, :, sl].astype(jnp.float32)
        sm = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale + kmask
        m_prev = m_scr[:, s:s + 1]
        m_cur = jnp.max(sm, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(sm - m_new)
        l_scr[:, s:s + 1] = (alpha * l_scr[:, s:s + 1]
                             + jnp.sum(p, axis=-1, keepdims=True))
        acc_scr[:, sl] = acc_scr[:, sl] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, s:s + 1] = m_new

    @pl.when(kv_idx == pl.num_programs(3) - 1)
    def _():
        for s in range(gh):
            sl = slice(s * dh, (s + 1) * dh)
            o_ref[0, :, sl] = (
                acc_scr[:, sl]
                / jnp.maximum(l_scr[:, s:s + 1], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_q", "block_k", "interpret"))
def flash_attention_packed(q, k, v, k_bias, num_heads: int,
                           block_q: int = 512, block_k: int = 1024,
                           interpret: bool = False):
    """Flash attention on head-PACKED layouts: q (B, Nq, H*Dh),
    k/v (B, Nk, H*Dh), k_bias (B, Nk) additive. Returns (B, Nq, H*Dh).

    Eliminates the (B,H,N,Dh) split transposes of the standard entry —
    at the decoder's ~45k-token KV those copies cost more than the
    attention math saved. Eval path only (no VJP; training routes through
    `attend`). Nq/Nk must be multiples of block_q/block_k (the decoder
    hoists the padding out of its 6-layer loop); head groups of 128 lanes
    require c % 128 == 0 and 128 % dh == 0."""
    b, nq, c = q.shape
    nk = k.shape[1]
    dh = c // num_heads
    assert c % num_heads == 0 and c % 128 == 0 and 128 % dh == 0, (
        c, num_heads)
    assert nq % block_q == 0 and nk % block_k == 0, (nq, nk)
    gh = 128 // dh
    biasr = k_bias.reshape(b, 1, nk).astype(jnp.float32)
    grid = (b, c // 128, nq // block_q, nk // block_k)
    return pl.pallas_call(
        functools.partial(_flash_kernel_packed,
                          sm_scale=1.0 / math.sqrt(dh), gh=gh, dh=dh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda b_, g, i, j: (b_, i, g)),
            pl.BlockSpec((1, block_k, 128), lambda b_, g, i, j: (b_, j, g)),
            pl.BlockSpec((1, block_k, 128), lambda b_, g, i, j: (b_, j, g)),
            pl.BlockSpec((1, 1, block_k), lambda b_, g, i, j: (b_, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128),
                               lambda b_, g, i, j: (b_, i, g)),
        out_shape=jax.ShapeDtypeStruct((b, nq, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, gh), jnp.float32),
            pltpu.VMEM((block_q, gh), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(q, k, v, biasr)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, kmask_ref, stats_ref,
                         do_ref, *rest, sm_scale, dropout_rate):
    """dQ pass: grid (bh, q-block, kv-block), kv arbitrary. Recomputes
    the tile's P from the saved (m, l) stats — one exp, no second
    softmax — and accumulates dQ = sum_k dS @ K * scale in VMEM. Never
    materializes (Nq, Nk)."""
    it = iter(rest)
    seed_ref = next(it) if dropout_rate > 0.0 else None
    dq_ref, acc_scr = it
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    stats = stats_ref[0]
    m = stats[:, 0:1]
    l = jnp.maximum(stats[:, 1:2], 1e-30)
    delta = stats[:, 2:3]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    s = s + kmask_ref[0, 0][None, :]
    p = jnp.exp(s - m) / l
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        _seed_tile(seed_ref, pl.program_id(0), pl.program_id(1), kv_idx,
                   pl.num_programs(1), pl.num_programs(2))
        dp = dp * _dropout_keep(dp.shape, dropout_rate)
    ds = p * (dp - delta)
    acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = (acc_scr[:] * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, kmask_ref, stats_ref,
                          do_ref, *rest, sm_scale, dropout_rate):
    """dK/dV/dk_bias pass: grid (bh, kv-block, q-block), q arbitrary.
    Per q step: recompute the tile's P, accumulate
    dV += dropout(P)^T @ dO, dK += dS^T @ Q * scale, dkb += colsum(dS).
    The dropout keep mask regenerates bit-identically to the forward
    (same per-tile seed, same (block_q, block_k) decomposition)."""
    it = iter(rest)
    seed_ref = next(it) if dropout_rate > 0.0 else None
    dk_ref, dv_ref, dkb_ref, dk_scr, dv_scr, dkb_scr = it
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)
        dkb_scr[:] = jnp.zeros_like(dkb_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    stats = stats_ref[0]
    m = stats[:, 0:1]
    l = jnp.maximum(stats[:, 1:2], 1e-30)
    delta = stats[:, 2:3]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale    # (bq, bk)
    s = s + kmask_ref[0, 0][None, :]
    p = jnp.exp(s - m) / l
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        _seed_tile(seed_ref, pl.program_id(0), q_idx, pl.program_id(1),
                   pl.num_programs(2), pl.num_programs(1))
        keep = _dropout_keep(p.shape, dropout_rate)
        pv = p * keep
        dp = dp * keep
    else:
        pv = p
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        pv, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (bk, d)
    ds = p * (dp - delta)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (bk, d)
    dkb_scr[0:1, :] = dkb_scr[0:1, :] + jnp.sum(
        ds, axis=0, keepdims=True)

    @pl.when(q_idx == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = (dk_scr[:] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)
        dkb_ref[0] = dkb_scr[:].astype(dkb_ref.dtype)


def _flash_backward(q, k, v, k_bias, out, m, l, do, seed, block_q,
                    block_k, interpret, dropout_rate):
    """Blocked flash backward (FlashAttention-2 recompute strategy): a dQ
    kernel parallel over q-blocks and a dK/dV kernel parallel over
    kv-blocks. O(N) memory — no (Nq, Nk) tensor is ever materialized
    (the r3 VJP built P in bf16: ~0.8 GB/layer at bench shapes)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bh = b * h
    scale = 1.0 / math.sqrt(d)
    qr = q.reshape(bh, nq, d)
    kr = k.reshape(bh, nk, d)
    vr = v.reshape(bh, nk, d)
    dor = do.reshape(bh, nq, d)
    biasr = jnp.broadcast_to(
        k_bias[:, None, :], (b, h, nk)).reshape(bh, 1, nk).astype(
            jnp.float32)
    # per-query stats rows: lane 0 = m, 1 = l, 2 = delta = rowsum(dO*O)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)
    stats = jnp.stack(
        [m.reshape(bh, nq), l.reshape(bh, nq), delta.reshape(bh, nq)],
        axis=-1)
    stats = jnp.pad(stats, ((0, 0), (0, 0), (0, 125)))

    common_specs = [
        pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),   # q
        pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),   # k
        pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),   # v
        pl.BlockSpec((1, 1, block_k), lambda b_, i, j: (b_, 0, j)),   # kb
        pl.BlockSpec((1, block_q, 128), lambda b_, i, j: (b_, i, 0)),
        pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),   # do
    ]
    operands = [qr, kr, vr, biasr, stats, dor]
    if dropout_rate > 0.0:
        common_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(seed, jnp.int32).reshape(1))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, sm_scale=scale,
                          dropout_rate=dropout_rate),
        grid=(bh, nq // block_q, nk // block_k),
        in_specs=common_specs,
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)

    # dkv grid: (bh, kv-block, q-block) — swap the block index args
    dkv_specs = [
        pl.BlockSpec((1, block_q, d), lambda b_, j, i: (b_, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b_, j, i: (b_, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b_, j, i: (b_, j, 0)),
        pl.BlockSpec((1, 1, block_k), lambda b_, j, i: (b_, 0, j)),
        pl.BlockSpec((1, block_q, 128), lambda b_, j, i: (b_, i, 0)),
        pl.BlockSpec((1, block_q, d), lambda b_, j, i: (b_, i, 0)),
    ]
    if dropout_rate > 0.0:
        dkv_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    dk, dv, dkb8 = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, sm_scale=scale,
                          dropout_rate=dropout_rate),
        grid=(bh, nk // block_k, nq // block_q),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b_, j, i: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j, i: (b_, j, 0)),
            pl.BlockSpec((1, 8, block_k), lambda b_, j, i: (b_, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), v.dtype),
            jax.ShapeDtypeStruct((bh, 8, nk), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((8, block_k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
    dkb = dkb8[:, 0].reshape(b, h, nk).sum(axis=1).astype(k_bias.dtype)
    return (dq.reshape(b, h, nq, d), dk.reshape(b, h, nk, d),
            dv.reshape(b, h, nk, d), dkb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention_diff(q, k, v, k_bias, seed=None, block_q: int = 128,
                         block_k: int = 1024, interpret: bool = False,
                         dropout_rate: float = 0.0):
    """Differentiable flash attention (training path).

    pallas_call has no automatic transpose rule, so jax.grad through the
    raw kernel fails at trace time. Forward runs the flash kernel (the
    with_stats variant when taped, with in-kernel dropout when
    `dropout_rate > 0` — the reference trains its 900 x ~50k
    cross-attention inside flash-attn with dropout,
    models/utils/attention.py:70-92); backward runs the blocked
    FlashAttention-2-style dQ and dK/dV Pallas kernels (`_flash_backward`)
    that recompute each P tile from the saved (m, l) stats and regenerate
    the dropout bits — O(N) memory end to end, nothing (Nq x Nk) is ever
    materialized. `seed` is an int32 (1,) array (required iff dropout)."""
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return flash_attention_kvmask(
        q, k, v, k_bias, block_q=block_q, block_k=block_k,
        interpret=interpret, dropout_rate=dropout_rate, seed=seed)


def _flash_diff_fwd(q, k, v, k_bias, seed, block_q, block_k, interpret,
                    dropout_rate):
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    out, m, l = flash_attention_kvmask(
        q, k, v, k_bias, block_q=block_q, block_k=block_k,
        interpret=interpret, with_stats=True, dropout_rate=dropout_rate,
        seed=seed)
    return out, (q, k, v, k_bias, seed, out, m, l)


def _flash_diff_bwd(block_q, block_k, interpret, dropout_rate, res, do):
    q, k, v, k_bias, seed, out, m, l = res
    dq, dk, dv, dkb = _flash_backward(
        q, k, v, k_bias, out, m, l, do, seed, block_q, block_k,
        interpret, dropout_rate)
    dseed = np.zeros(np.shape(seed), jax.dtypes.float0)
    return dq, dk, dv, dkb, dseed


flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def _pad_to(x, axis, multiple):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def attend(q, k, v, bias=None, k_bias=None, impl: str = "auto",
           block_q: int = 256, block_k: int = 2048,
           dropout_rate: float = 0.0, dropout_rng=None):
    # block defaults measured on v5e at the bench shape (8h x 1024q x 49k
    # kv): (256, 2048) = 1.9 ms vs (128, 1024) = 3.4 ms — fewer KV
    # re-streams per q-block; (1024, 4096) exceeds the 16M scoped VMEM.
    """Dispatch: Pallas flash for long-KV padding-masked attention, XLA
    reference otherwise (e.g. DN-masked self-attention, 2D bias).

    Ragged shapes are handled by padding Q (sliced back afterwards) and KV
    (masked out via the per-key bias), so the eval-time 900-query x ~48k-key
    cross-attention takes the flash path too."""
    nq, nk = q.shape[2], k.shape[2]
    if impl == "flash" and bias is not None:
        # the flash kernel only supports a per-key bias; silently dropping
        # a full (.., Nq, Nk) bias would un-mask DN self-attention
        raise ValueError(
            "attend(impl='flash') cannot apply a 2D attention bias; use "
            "k_bias for KV padding or impl='auto'/'reference' for DN masks")
    on_tpu = jax.default_backend() == "tpu"
    if dropout_rate > 0.0 and impl == "flash" and not on_tpu:
        raise ValueError(
            "attend(impl='flash') with attention dropout needs the TPU "
            "backend (the in-kernel PRNG has no interpret lowering)")
    use_flash = (
        impl == "flash"
        or (impl == "auto" and bias is None and nk >= 4096 and on_tpu)
    )
    if use_flash:
        if k_bias is None:
            k_bias = jnp.zeros((q.shape[0], nk), jnp.float32)
        qp = _pad_to(q, 2, block_q)
        kp = _pad_to(k, 2, block_k)
        vp = _pad_to(v, 2, block_k)
        kb = jnp.pad(k_bias, ((0, 0), (0, kp.shape[2] - nk)),
                     constant_values=NEG_INF)
        seed = None
        if dropout_rate > 0.0:
            assert dropout_rng is not None
            # in-kernel dropout (train): derive the per-call PRNG seed
            # from the flax dropout rng — the tile seeds fold this with
            # the (bh, q-block, kv-block) ids
            seed = jax.random.randint(
                dropout_rng, (1,), 0, 2 ** 31 - 1, dtype=jnp.int32)
        out = flash_attention_diff(qp, kp, vp, kb, seed, block_q, block_k,
                                   False, float(dropout_rate))
        return out[:, :, :nq]
    if k_bias is not None:
        kb = k_bias[:, None, None, :]
        bias = kb if bias is None else bias + kb
    return mha_reference(q, k, v, bias, dropout_rate=dropout_rate,
                         dropout_rng=dropout_rng)
