"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from cmtcoop_tpu.ops import attention as A


def _flash(q, k, v, kb, block_q=64, block_k=128):
    return A.flash_attention_kvmask(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kb),
        block_q=block_q, block_k=block_k, interpret=True)


def test_flash_matches_reference(rng):
    b, h, nq, nk, d = 1, 2, 128, 512, 32
    q = rng.normal(size=(b, h, nq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, nk, d)).astype(np.float32)
    v = rng.normal(size=(b, h, nk, d)).astype(np.float32)
    kb = np.zeros((b, nk), np.float32)
    oracle = np.asarray(A.mha_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    ours = np.asarray(_flash(q, k, v, kb))
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-4)


def test_flash_kv_padding_mask(rng):
    b, h, nq, nk, d = 1, 1, 64, 256, 16
    q = rng.normal(size=(b, h, nq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, nk, d)).astype(np.float32)
    v = rng.normal(size=(b, h, nk, d)).astype(np.float32)
    kb = np.zeros((b, nk), np.float32)
    kb[:, 200:] = A.NEG_INF  # mask the tail keys
    oracle = np.asarray(A.mha_reference(
        jnp.asarray(q), jnp.asarray(k[:, :, :200]),
        jnp.asarray(v[:, :, :200])))
    ours = np.asarray(_flash(q, k, v, kb))
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-4)


def test_forced_flash_rejects_2d_bias():
    """attend(impl='flash') must refuse a full attention bias rather than
    silently dropping it (it would un-mask DN self-attention)."""
    import pytest as _pytest
    from cmtcoop_tpu.ops.attention import attend
    q = jnp.zeros((1, 2, 8, 16))
    k = jnp.zeros((1, 2, 32, 16))
    v = jnp.zeros((1, 2, 32, 16))
    bias = jnp.zeros((1, 1, 8, 32))
    with _pytest.raises(ValueError, match="2D attention bias"):
        attend(q, k, v, bias=bias, impl="flash")


def test_flash_grad_matches_xla(rng):
    """jax.grad through the flash path (custom VJP: flash forward,
    blocked FlashAttention-2-style Pallas backward) matches grads through
    mha_reference — the train-on-TPU code path. Multiple q AND kv blocks
    so the backward kernels' accumulation-across-blocks is exercised."""
    from cmtcoop_tpu.ops.attention import (
        NEG_INF, flash_attention_diff, mha_reference)

    b, h, nq, nk, d = 1, 2, 128, 512, 16
    q = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
    kb = np.zeros((b, nk), np.float32)
    kb[:, 400:] = NEG_INF                      # padded keys
    kb = jnp.asarray(kb)
    tgt = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))

    def loss_flash(q_, k_, v_):
        o = flash_attention_diff(q_, k_, v_, kb, None, 64, 128, True)
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(q_, k_, v_):
        o = mha_reference(q_, k_, v_, kb[:, None, None, :])
        return jnp.sum((o - tgt) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
    # padded keys receive zero gradient
    assert float(jnp.abs(gf[1][:, :, 400:]).max()) < 1e-6
    assert float(jnp.abs(gf[2][:, :, 400:]).max()) < 1e-6


def test_flash_kbias_grad_matches_xla(rng):
    """The blocked backward's dk_bias accumulation (colsum of dS over
    queries and heads) matches grads through the XLA reference."""
    from cmtcoop_tpu.ops.attention import (
        flash_attention_diff, mha_reference)

    b, h, nq, nk, d = 2, 2, 64, 256, 16
    q = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
    kb = jnp.asarray(rng.normal(size=(b, nk)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))

    def loss_flash(kb_):
        o = flash_attention_diff(q, k, v, kb_, None, 64, 128, True)
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(kb_):
        o = mha_reference(q, k, v, kb_[:, None, None, :])
        return jnp.sum((o - tgt) ** 2)

    gf = jax.grad(loss_flash)(kb)
    gr = jax.grad(loss_ref)(kb)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=3e-4, atol=3e-4)


def test_flash_packed_matches_reference(rng):
    """Head-packed layout (B, N, H*Dh) kernel vs the split-layout oracle,
    with masked KV padding rows."""
    b, h, dh, nq, nk = 2, 4, 32, 256, 1024
    c = h * dh
    q = jnp.asarray(rng.normal(size=(b, nq, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, nk, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, nk, c)).astype(np.float32))
    kb = np.zeros((b, nk), np.float32)
    kb[:, -100:] = A.NEG_INF  # padding tail
    def split(x):
        return x.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)
    ref = A.mha_reference(split(q), split(k), split(v),
                          jnp.asarray(kb)[:, None, None, :])
    ref = ref.transpose(0, 2, 1, 3).reshape(b, nq, c)
    # block_q 64: non-128-multiple q blocks (the decoder uses 464 to pad
    # the 900 queries to 928 instead of 1024)
    for bq in (128, 64):
        out = A.flash_attention_packed(
            q, k, v, jnp.asarray(kb), h, block_q=bq, block_k=256,
            interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
