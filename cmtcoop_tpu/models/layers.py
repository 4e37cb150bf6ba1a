"""Shared flax building blocks (NHWC, TPU-friendly layouts).

Conventions:
- images / BEV maps are NHWC (channels-last — XLA's preferred TPU layout);
  the reference's NCHW tensors map 1:1.
- `dtype` is the compute dtype (bfloat16 on TPU for the conv towers),
  `param_dtype` stays float32.
- BatchNorm momentum uses the flax convention: flax_momentum = 1 - torch_momentum.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBNReLU(nn.Module):
    """Conv2d(bias=False) + BatchNorm + optional ReLU, torch-equivalent.

    Default padding is torch-style centered ((k-1)//2 on both sides) — NOT
    XLA "SAME": for stride-2 convs SAME pads (0, 1) while torch pads (1, 1),
    which shifts every window by one pixel and breaks bit-parity with
    reference weights (VoVNet stems, SECOND block1, ResNet downsamples).
    At stride 1 the two conventions coincide.
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = None
    groups: int = 1
    use_relu: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9  # = 1 - torch 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if pad is None:
            pad = tuple(((k - 1) // 2, (k - 1) // 2)
                        for k in self.kernel_size)
        x = nn.Conv(
            self.features, self.kernel_size, self.strides,
            padding=pad, feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=self.bn_eps, dtype=self.dtype)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


def conv_bn_relu_cf(variables, x_nhwc, dtype, relu: bool = True,
                    bn_eps: float = 1e-5, interpret=None):
    """Eval fast path for a 3x3/stride-1 `ConvBNReLU`: the channels-first
    Pallas conv kernel (ops/conv_cf.py) with the BatchNorm folded into the
    epilogue. Pure function over the module's variable tree (same pattern
    as models/vovnet_cf.py) — XLA's NHWC conv pads the 512-ch contraction
    and runs the head's shared_conv (cmt_head.py shared_conv; reference
    cmt_head.py:206-322 shared_conv) at ~18% of MXU peak (probe_trace:
    2.13 ms/agent at 180x180x512->256); the cf kernel K-packs 3*Cin.
    """
    from cmtcoop_tpu.ops.conv_cf import conv3x3_cf, from_cf, to_cf
    p = variables["params"]
    bs = variables["batch_stats"]
    k = p["Conv_0"]["kernel"]
    scale = p["BatchNorm_0"]["scale"] * jax.lax.rsqrt(
        bs["BatchNorm_0"]["var"] + bn_eps)
    bias = p["BatchNorm_0"]["bias"] - bs["BatchNorm_0"]["mean"] * scale
    b, h, w, _ = x_nhwc.shape
    y = conv3x3_cf(to_cf(x_nhwc.astype(dtype)), k.astype(dtype), h, w,
                   scale=scale, bias=bias, relu=relu, mstack=True,
                   interpret=interpret)
    return from_cf(y, h, w)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the valid rows of a padded (N, C) feature array.

    The reference's sparse encoder runs torch BN1d over only the active
    voxels (spconv stores a dense (n_active, C) feature matrix); with padded
    static shapes the padding rows must not pollute the statistics.
    """
    epsilon: float = 1e-3
    momentum: float = 0.99  # = 1 - torch 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray = None,
                 train: bool = False, fold: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if fold:
            # eval-mode affine fold: y = x*eff_scale + eff_bias (for fused
            # conv+BN kernels; x is only used for its channel count)
            eff_scale = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            eff_bias = bias - ra_mean.value * eff_scale
            return eff_scale, eff_bias

        if train:
            m = mask.reshape(-1).astype(jnp.float32)
            xf = x.reshape(-1, c).astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(xf * m[:, None], axis=0) / cnt
            var = jnp.sum(((xf - mean) ** 2) * m[:, None], axis=0) / cnt
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean)
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return (y * mask[..., None]).astype(self.dtype)


class MLP(nn.Module):
    """Linear -> ReLU -> Linear (query/bev/rv embedding MLPs,
    cmt_head.py:292-302)."""
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype)(x)


class FFN(nn.Module):
    """mmcv FFN: Linear -> ReLU -> drop -> Linear -> drop -> +identity."""
    hidden: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Dense(self.hidden, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(x.shape[-1], dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return identity + y

