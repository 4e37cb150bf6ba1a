"""DETR-style decoder stack (PETRTransformerDecoder rebuild).

Reference: models/utils/petr_transformer.py — layer op order
('self_attn','norm','cross_attn','norm','ffn','norm') with post-LN, shared
final post_norm applied to every intermediate output (return_intermediate),
PE added to q/k but not v, identity residual taken before PE
(petr_transformer.py:137-177, 325-371, 374-487).

Unlike the reference (which needs two attention impls because flash-attn
0.2.2 can't mask), both attentions here route through `ops.attention.attend`:
the DN self-attention mask is an additive bias, the cross-attention KV
padding is a per-key bias eligible for the Pallas flash path.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

import jax

from cmtcoop_tpu.models.layers import FFN
from cmtcoop_tpu.ops.attention import (NEG_INF, attend,
                                       flash_attention_packed)

PACKED_BLOCK_K = 2048  # decoder KV padding / flash block_k (eval path;
#                        measured 1.23 ms vs 1.62 at bk1024, bench shape)


def packed_flash_backend_ok() -> bool:
    """Single point of truth for 'the Pallas flash kernels can run here'.

    Tests monkeypatch this to trace the packed eval path on CPU and assert
    which attention impl the dispatch predicates select at bench shapes
    (a mis-predicate silently costs ~2x attention latency otherwise).
    """
    return jax.default_backend() == "tpu"


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent projections around `attend`.

    `attn_dropout` reproduces torch's attn_drop (dropout on the softmax
    weights) which the reference enables at 0.1 in both decoder attentions
    (petr_transformer.py:68-82, config attn_cfgs dropout=0.1). On TPU the
    long-KV cross-attention keeps the flash path in train mode — dropout
    runs in-kernel and the backward is blocked (ops/attention.py), the
    reference's train-inside-flash behavior (attention.py:70-92); the
    DN-masked self-attention (2D bias) uses the XLA path.

    `impl="kv_shard"` runs the cross-attention with the KV token memory
    sharded over `kv_shard_mesh`'s `kv_shard_axis` (parallel/kv_shard.py
    log-sum-exp merge) — the multi-chip serving path for the ~50k-token
    memory (SURVEY §2.3 rebuild note b).
    """
    embed_dims: int
    num_heads: int
    impl: str = "auto"
    attn_dropout: float = 0.0
    train_mode: bool = False
    kv_shard_mesh: Any = None
    kv_shard_axis: str = "mp"
    kv_block_q: int = 128
    kv_block_k: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, bias=None, k_bias=None):
        b, nq, c = q.shape
        h = self.num_heads
        dh = c // h

        def split(x):
            return x.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)

        nk = k.shape[1]
        drop = self.attn_dropout if self.train_mode else 0.0
        # head-packed eval flash: skip the (B,H,N,Dh) split transposes of
        # the ~45k-token KV entirely (the kernel lane-slices heads out of
        # the projection outputs). Requires pre-padded KV (the decoder
        # pads once, outside its layer loop) and no mask/dropout.
        if (self.impl == "auto" and bias is None and drop == 0.0
                and not self.train_mode and nk >= 4096
                and nk % PACKED_BLOCK_K == 0
                and packed_flash_backend_ok()):
            qd = nn.Dense(c, dtype=self.dtype, name="q_proj")(q)
            kd = nn.Dense(c, dtype=self.dtype, name="k_proj")(k)
            vd = nn.Dense(c, dtype=self.dtype, name="v_proj")(v)
            if k_bias is None:
                k_bias = jnp.zeros((b, nk), jnp.float32)
            # block_q 464, not 512: the 900 queries pad to 928 instead of
            # 1024 (-9.4% QK/PV rows; MXU M granularity is the 8-row
            # sublane, so M=464 pays no pass padding) while keeping the
            # same number of q-blocks, i.e. no extra KV re-streaming
            bq = 464 if 464 < nq <= 928 else 512
            pad_q = (-nq) % bq
            if pad_q:
                qd = jnp.pad(qd, ((0, 0), (0, pad_q), (0, 0)))
            out = flash_attention_packed(
                qd, kd, vd, k_bias, h, block_q=bq,
                block_k=PACKED_BLOCK_K)[:, :nq]
            return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)

        qh = split(nn.Dense(c, dtype=self.dtype, name="q_proj")(q))
        kh = split(nn.Dense(c, dtype=self.dtype, name="k_proj")(k))
        vh = split(nn.Dense(c, dtype=self.dtype, name="v_proj")(v))
        if self.impl == "kv_shard":
            from cmtcoop_tpu.parallel.kv_shard import (
                kv_sharded_attention, pad_kv_for_shards)
            assert bias is None, "kv_shard path is padding-mask only"
            assert drop == 0.0, "kv_shard path is eval-only (no dropout)"
            mesh = self.kv_shard_mesh
            n_shards = mesh.shape[self.kv_shard_axis]
            kb = (k_bias if k_bias is not None
                  else jnp.zeros((b, kh.shape[2]), jnp.float32))
            kp, vp, kbp = pad_kv_for_shards(
                kh, vh, kb, n_shards, self.kv_block_k)
            pad_q = (-nq) % self.kv_block_q
            qp = jnp.pad(qh, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
            out = kv_sharded_attention(
                mesh, qp, kp, vp, kbp, axis=self.kv_shard_axis,
                block_q=self.kv_block_q, block_k=self.kv_block_k)
            out = out[:, :, :nq]
        else:
            # train-time long-KV cross-attention now rides the flash
            # kernel too (in-kernel dropout + blocked backward on TPU;
            # attend's dispatch falls back to the XLA path on CPU or when
            # a 2D bias is present)
            rng = self.make_rng("dropout") if drop > 0.0 else None
            out = attend(qh, kh, vh, bias=bias, k_bias=k_bias,
                         impl=self.impl, dropout_rate=drop,
                         dropout_rng=rng)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class PETRDecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024
    dropout: float = 0.1
    train_mode: bool = False
    cross_impl: str = "auto"
    kv_shard_mesh: Any = None
    kv_shard_axis: str = "mp"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, memory, query_pos, memory_pos,
                 self_attn_bias, memory_k_bias, memory_pe=None):
        train = self.train_mode
        # --- self attention (DN mask as additive bias) ---
        identity = query
        q = query + query_pos
        out = MultiheadAttention(
            self.embed_dims, self.num_heads, "xla",
            attn_dropout=self.dropout, train_mode=train, dtype=self.dtype,
            name="self_attn")(q, q, query, bias=self_attn_bias)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        query = nn.LayerNorm(dtype=self.dtype, name="norm1")(identity + out)

        # --- cross attention over the fused token memory ---
        identity = query
        q = query + query_pos
        # memory_pe = memory + memory_pos, hoisted out of the 6-layer loop
        # by the decoder (the sum is layer-invariant; only the projections
        # differ per layer)
        k = memory + memory_pos if memory_pe is None else memory_pe
        out = MultiheadAttention(
            self.embed_dims, self.num_heads, self.cross_impl,
            attn_dropout=self.dropout, train_mode=train,
            kv_shard_mesh=self.kv_shard_mesh,
            kv_shard_axis=self.kv_shard_axis, dtype=self.dtype,
            name="cross_attn")(q, k, memory, k_bias=memory_k_bias)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        query = nn.LayerNorm(dtype=self.dtype, name="norm2")(identity + out)

        # --- FFN ---
        query = FFN(self.feedforward_channels, 0.0, self.dtype,
                    name="ffn")(query, train=train)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(query)


class PETRTransformerDecoder(nn.Module):
    """num_layers decoder stack returning all intermediate outputs
    (num_layers, B, Nq, C), each passed through the shared post_norm."""
    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 1024
    dropout: float = 0.1
    remat: bool = True
    train_mode: bool = False
    cross_impl: str = "auto"
    kv_shard_mesh: Any = None
    kv_shard_axis: str = "mp"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, memory, query_pos, memory_pos,
                 self_attn_bias=None, memory_k_bias=None):
        post_norm = nn.LayerNorm(dtype=self.dtype, name="post_norm")
        layer_cls = PETRDecoderLayer
        if self.remat and self.train_mode:
            # per-layer rematerialization = the reference's with_cp
            # (petr_transformer.py:463-474)
            layer_cls = nn.remat(PETRDecoderLayer)
        # hoist the layer-invariant memory work out of the loop: the PE
        # add, and (for the eval flash path) the KV padding to the flash
        # block size — zero-padded keys are masked via NEG_INF k_bias, so
        # projecting the pad rows is exact
        memory_pe = memory + memory_pos
        b, nk = memory.shape[0], memory.shape[1]
        pad_k = (-nk) % PACKED_BLOCK_K
        if (pad_k and not self.train_mode and self.cross_impl == "auto"
                and nk >= 4096 and packed_flash_backend_ok()):
            memory = jnp.pad(memory, ((0, 0), (0, pad_k), (0, 0)))
            memory_pe = jnp.pad(memory_pe, ((0, 0), (0, pad_k), (0, 0)))
            if memory_k_bias is None:
                memory_k_bias = jnp.zeros((b, nk), jnp.float32)
            memory_k_bias = jnp.pad(memory_k_bias, ((0, 0), (0, pad_k)),
                                    constant_values=NEG_INF)
        intermediates = []
        for i in range(self.num_layers):
            query = layer_cls(
                self.embed_dims, self.num_heads, self.feedforward_channels,
                self.dropout, self.train_mode, self.cross_impl,
                self.kv_shard_mesh, self.kv_shard_axis, self.dtype,
                name=f"layer{i}")(
                    query, memory, query_pos, memory_pos, self_attn_bias,
                    memory_k_bias, memory_pe)
            intermediates.append(post_norm(query))
        return jnp.stack(intermediates, axis=0)
