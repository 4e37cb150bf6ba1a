"""KV-sharded cross-attention over the "mp" mesh axis.

The reference handles its ~50k-token cross-attention memory within one GPU
via flash-attn (SURVEY §5.7); on a TPU pod slice the token memory can
instead be sharded across ICI: each device runs flash attention over its KV
shard (emitting the per-query softmax stats), and the partial attentions
are merged with one log-sum-exp combine (pmax + two psums) — numerically
identical to attending over the full memory. This is the blockwise /
ring-attention math with a single collective round instead of a ring pass,
which is optimal when Q is small (900 queries) and KV is what's sharded.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from cmtcoop_tpu.ops.attention import NEG_INF, flash_attention_kvmask


def merge_partials(out, m, l, axis: str):
    """Combine per-shard flash partials: out_i (…, nq, d) locally
    normalized, m_i/l_i (…, nq) running max/normalizer."""
    m_glob = jax.lax.pmax(m, axis)
    w = l * jnp.exp(m - m_glob)                       # (b, h, nq)
    num = jax.lax.psum(out.astype(jnp.float32) * w[..., None], axis)
    den = jax.lax.psum(w, axis)
    return (num / jnp.maximum(den, 1e-30)[..., None]).astype(out.dtype)


def kv_sharded_attention(
    mesh: Mesh, q, k, v, k_bias=None, axis: str = "mp",
    block_q: int = 256, block_k: int = 1024,
    interpret: Optional[bool] = None,
):
    """q (B, H, Nq, D) replicated; k/v (B, H, Nk, D) and k_bias (B, Nk)
    sharded on `axis` along the token dim. Nq % block_q == 0 and the
    per-shard Nk % block_k == 0 (pad KV with k_bias = NEG_INF)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if k_bias is None:
        k_bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)

    def local(q_, k_, v_, kb_):
        out, m, l = flash_attention_kvmask(
            q_, k_, v_, kb_, block_q=block_q, block_k=block_k,
            interpret=interpret, with_stats=True)
        return merge_partials(out, m, l, axis)

    sm_kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(None, None, axis, None), P(None, None, axis, None),
                  P(None, axis)),
        out_specs=P(),
    )
    # the inner pallas_call doesn't annotate vma, so disable replication
    # checking (kwarg name differs across jax versions)
    try:
        wrapped = shard_map(local, check_vma=False, **sm_kwargs)
    except TypeError:
        wrapped = shard_map(local, check_rep=False, **sm_kwargs)
    return wrapped(q, k, v, k_bias)


def pad_kv_for_shards(k, v, k_bias, n_shards: int, block_k: int = 1024):
    """Pad the KV token dim so each of `n_shards` shards is a multiple of
    block_k; padding keys carry NEG_INF bias."""
    nk = k.shape[2]
    mult = n_shards * block_k
    pad = (-nk) % mult
    if pad:
        widths = [(0, 0)] * k.ndim
        widths[2] = (0, pad)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
        k_bias = jnp.pad(k_bias, ((0, 0), (0, pad)),
                         constant_values=NEG_INF)
    return k, v, k_bias
