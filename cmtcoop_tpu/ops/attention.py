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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


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


def _flash_kernel(q_ref, k_ref, v_ref, kmask_ref, o_ref, *rest,
                  sm_scale, block_k, kv_len, with_stats):
    """One (batch*head, q-block) program: stream KV blocks with online
    softmax. kmask is a per-key additive bias row (encodes KV padding).
    With `with_stats`, also emits the per-query running (m, l) so callers
    can merge partial attentions across KV shards (log-sum-exp combine)."""
    if with_stats:
        ml_ref, m_scr, l_scr, acc_scr = rest
    else:
        m_scr, l_scr, acc_scr = rest
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
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
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
    static_argnames=("block_q", "block_k", "interpret", "with_stats"))
def flash_attention_kvmask(q, k, v, k_bias, block_q: int = 128,
                           block_k: int = 1024, interpret: bool = False,
                           with_stats: bool = False):
    """Flash attention with a per-key additive bias (KV padding mask).

    Covers the reference's cross-attention use case (padding-only masking)
    with O(Nq*Dh) VMEM. Shapes: q (B,H,Nq,Dh), k/v (B,H,Nk,Dh),
    k_bias (B, Nk) additive (0 or NEG_INF).

    With `with_stats`, returns (out, m, l) where m/l are the per-query
    softmax running max and normalizer ((B,H,Nq) float32) — the sufficient
    statistics for merging attention over KV shards.
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
            kv_len=nk, with_stats=with_stats),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, i, j: (b_, 0, j)),
        ],
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
    )(qr, kr, vr, biasr)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_diff(q, k, v, k_bias, block_q: int = 128,
                         block_k: int = 1024, interpret: bool = False):
    """Differentiable wrapper over the Pallas flash kernel.

    pallas_call has no automatic transpose rule, so jax.grad through the
    raw kernel fails at trace time — which made dropout-free training on
    TPU (where `attend` routes long-KV cross-attention to flash) a crash.
    Forward runs the flash kernel (the with_stats variant when taped);
    backward recomputes P from the saved (m, l) softmax stats — one exp,
    no second softmax pass — and takes the standard attention gradients
    as XLA einsums. The backward materializes P (B, H, Nq, Nk) in bf16,
    the FlashAttention-2 recompute strategy without the blocked dP pass;
    at the bench shape (8h x 1k x 49k) that is ~0.8 GB of HBM, fine on a
    16 GB chip (training with DN masks uses the XLA path anyway).
    """
    return flash_attention_kvmask(q, k, v, k_bias, block_q=block_q,
                                  block_k=block_k, interpret=interpret)


def _flash_diff_fwd(q, k, v, k_bias, block_q, block_k, interpret):
    out, m, l = flash_attention_kvmask(
        q, k, v, k_bias, block_q=block_q, block_k=block_k,
        interpret=interpret, with_stats=True)
    return out, (q, k, v, k_bias, out, m, l)


def _flash_diff_bwd(block_q, block_k, interpret, res, do):
    q, k, v, k_bias, out, m, l = res
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + k_bias[:, None, None, :].astype(jnp.float32)
    p = (jnp.exp(s - m[..., None])
         / jnp.maximum(l, 1e-30)[..., None]).astype(v.dtype)
    dof = do.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do,
                    preferred_element_type=jnp.float32).astype(v.dtype)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do, v,
                    preferred_element_type=jnp.float32)
    delta = jnp.sum(dof * out.astype(jnp.float32), axis=-1,
                    keepdims=True)                      # (b, h, nq, 1)
    ds = p.astype(jnp.float32) * (dp - delta)
    dq = (jnp.einsum("bhqk,bhkd->bhqd", ds.astype(k.dtype), k,
                     preferred_element_type=jnp.float32)
          * scale).astype(q.dtype)
    dk = (jnp.einsum("bhqk,bhqd->bhkd", ds.astype(q.dtype), q,
                     preferred_element_type=jnp.float32)
          * scale).astype(k.dtype)
    dkb = jnp.sum(ds, axis=(1, 2)).astype(k_bias.dtype)
    return dq, dk, dv, dkb


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
    if dropout_rate > 0.0 and impl == "flash":
        raise ValueError(
            "attend(impl='flash') does not implement attention-weight "
            "dropout; training with attn dropout must use the XLA path")
    use_flash = (
        impl == "flash"
        or (impl == "auto" and bias is None and dropout_rate == 0.0
            and nk >= 4096 and jax.default_backend() == "tpu")
    )
    if use_flash:
        if k_bias is None:
            k_bias = jnp.zeros((q.shape[0], nk), jnp.float32)
        qp = _pad_to(q, 2, block_q)
        kp = _pad_to(k, 2, block_k)
        vp = _pad_to(v, 2, block_k)
        kb = jnp.pad(k_bias, ((0, 0), (0, kp.shape[2] - nk)),
                     constant_values=NEG_INF)
        out = flash_attention_diff(qp, kp, vp, kb, block_q, block_k)
        return out[:, :, :nq]
    if k_bias is not None:
        kb = k_bias[:, None, None, :]
        bias = kb if bias is None else bias + kb
    return mha_reference(q, k, v, bias, dropout_rate=dropout_rate,
                         dropout_rng=dropout_rng)
