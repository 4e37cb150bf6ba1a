"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""
import numpy as np
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
