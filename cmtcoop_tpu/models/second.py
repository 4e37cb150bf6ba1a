"""SECOND dense BEV backbone + SECONDFPN neck (mmdet3d equivalents).

Reference configs (coop config:252-267): SECOND(in 256, out [128, 256],
layer_nums [5, 5], strides [1, 2], BN eps 1e-3 momentum 0.01, bias-free
convs); SECONDFPN(in [128, 256] -> out [256, 256], upsample_strides [1, 2],
deconv, use_conv_for_no_stride=True) -> concat 512-ch BEV at 180x180.

Pure dense NHWC convs — XLA maps these straight onto the MXU; no custom
kernels needed (SURVEY §2.2 "cuDNN convs" row).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cmtcoop_tpu.models.layers import ConvBNReLU

_BN = dict(bn_eps=1e-3, bn_momentum=0.99)


class SECOND(nn.Module):
    out_channels: Sequence[int] = (128, 256)
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for i, n_layers in enumerate(self.layer_nums):
            x = ConvBNReLU(
                self.out_channels[i], (3, 3),
                (self.layer_strides[i],) * 2, dtype=self.dtype, **_BN,
                name=f"block{i}_conv0")(x, train)
            for j in range(n_layers):
                x = ConvBNReLU(
                    self.out_channels[i], (3, 3), (1, 1), dtype=self.dtype,
                    **_BN, name=f"block{i}_conv{j + 1}")(x, train)
            outs.append(x)
        return tuple(outs)


class SECONDFPN(nn.Module):
    out_channels: Sequence[int] = (256, 256)
    upsample_strides: Sequence[int] = (1, 2)
    use_conv_for_no_stride: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        ups = []
        for i, x in enumerate(feats):
            s = self.upsample_strides[i]
            if s > 1 or (s == 1 and not self.use_conv_for_no_stride):
                y = nn.ConvTranspose(
                    self.out_channels[i], (s, s), (s, s), padding="VALID",
                    use_bias=False, dtype=self.dtype,
                    name=f"deblock{i}_up")(x)
            else:
                y = nn.Conv(
                    self.out_channels[i], (1, 1), (1, 1), use_bias=False,
                    dtype=self.dtype, name=f"deblock{i}_conv")(x)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name=f"deblock{i}_bn")(y)
            ups.append(nn.relu(y))
        return jnp.concatenate(ups, axis=-1)
