"""KV-sharded cross-attention on the virtual 8-device mesh vs the
single-device oracle (VERDICT r1 item 9 / SURVEY §2.3 rebuild implication)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmtcoop_tpu.ops.attention import NEG_INF, mha_reference
from cmtcoop_tpu.parallel.kv_shard import (
    kv_sharded_attention, pad_kv_for_shards)
from cmtcoop_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("mp", [2, 4])
def test_kv_sharded_matches_oracle(rng, mp):
    mesh = make_mesh(num_dp=8 // mp, num_mp=mp)
    b, h, nq, nk, d = 1, 2, 128, 256 * mp, 16
    q = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
    # mask a tail of real keys too, to exercise bias merging
    kb = np.zeros((b, nk), np.float32)
    kb[:, -40:] = NEG_INF
    kb = jnp.asarray(kb)

    want = mha_reference(q, k, v, bias=kb[:, None, None, :])
    got = kv_sharded_attention(mesh, q, k, v, kb, block_q=128, block_k=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kv_shard_with_fully_masked_shard(rng):
    """A shard whose keys are ALL padding must contribute zero weight."""
    mesh = make_mesh(num_dp=4, num_mp=2)
    b, h, nq, d = 1, 2, 128, 16
    nreal = 256
    q = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, nreal, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, nreal, d)).astype(np.float32))
    kb = jnp.zeros((b, nreal), jnp.float32)
    want = mha_reference(q, k, v)

    kp, vp, kbp = pad_kv_for_shards(k, v, kb, n_shards=2, block_k=256)
    assert kp.shape[2] == 512  # second shard is pure padding
    got = kv_sharded_attention(mesh, q, kp, vp, kbp, block_q=128,
                               block_k=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_stats_roundtrip(rng):
    """with_stats merge math: two manual halves == full attention."""
    from cmtcoop_tpu.ops.attention import flash_attention_kvmask
    from cmtcoop_tpu.parallel.kv_shard import merge_partials

    b, h, nq, nk, d = 1, 2, 128, 512, 16
    q = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
    kb = jnp.zeros((b, nk), jnp.float32)
    want = mha_reference(q, k, v)

    halves = []
    for s in (slice(0, 256), slice(256, 512)):
        out, m, l = flash_attention_kvmask(
            q, k[:, :, s], v[:, :, s], kb[:, s], block_q=128, block_k=256,
            interpret=True, with_stats=True)
        halves.append((out.astype(jnp.float32), m, l))
    m_glob = jnp.maximum(halves[0][1], halves[1][1])
    num = sum(o * (l * jnp.exp(m - m_glob))[..., None]
              for o, m, l in halves)
    den = sum(l * jnp.exp(m - m_glob) for _, m, l in halves)
    got = num / den[..., None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
