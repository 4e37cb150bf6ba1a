"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""
import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmtcoop_tpu.ops import attention as A


def _flash_interpret(q, k, v, k_bias, block_q=64, block_k=128):
    """Run the production kernel in interpreter mode."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bh = b * h
    qr = q.reshape(bh, nq, d)
    kr = k.reshape(bh, nk, d)
    vr = v.reshape(bh, nk, d)
    biasr = jnp.broadcast_to(
        k_bias[:, None, :], (b, h, nk)).reshape(bh, nk).astype(jnp.float32)
    grid = (bh, nq // block_q, nk // block_k)
    out = pl.pallas_call(
        functools.partial(
            A._flash_kernel, sm_scale=1.0 / math.sqrt(d), block_k=block_k,
            kv_len=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k), lambda b_, i, j: (b_, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=True,
    )(qr, kr, vr, biasr)
    return out.reshape(b, h, nq, d)


def test_flash_matches_reference(rng):
    b, h, nq, nk, d = 1, 2, 128, 512, 32
    q = rng.normal(size=(b, h, nq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, nk, d)).astype(np.float32)
    v = rng.normal(size=(b, h, nk, d)).astype(np.float32)
    kb = np.zeros((b, nk), np.float32)
    oracle = np.asarray(A.mha_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    ours = np.asarray(_flash_interpret(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kb)))
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-4)


def test_flash_kv_padding_mask(rng):
    b, h, nq, nk, d = 1, 1, 64, 256, 16
    q = rng.normal(size=(b, h, nq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, nk, d)).astype(np.float32)
    v = rng.normal(size=(b, h, nk, d)).astype(np.float32)
    kb = np.zeros((b, nk), np.float32)
    kb[:, 200:] = A.NEG_INF  # mask the tail keys
    oracle = np.asarray(A.mha_reference(
        jnp.asarray(q[:, :, :, :]), jnp.asarray(k[:, :, :200]),
        jnp.asarray(v[:, :, :200])))
    ours = np.asarray(_flash_interpret(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kb)))
    np.testing.assert_allclose(ours, oracle, rtol=2e-4, atol=2e-4)
