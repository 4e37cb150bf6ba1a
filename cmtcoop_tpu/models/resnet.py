"""ResNet image backbone (mmdet ResNet equivalent, torchvision layout).

The reference's 13th config (CMT_Nuscenes/fusion/cmt_voxel0100_r50_800x320_
cbgs.py:190-199) uses mmdet's `ResNet(depth=50, out_indices=(2, 3),
norm_eval=True, with_cp=True, style='pytorch')` with CPFPN in [1024, 2048].
This is a torch-layout-convertible flax rebuild: module names mirror the
torchvision/mmdet state_dict scheme (conv1/bn1, layer{1..4}.{i}.conv{1,2,3})
so `train.torch_convert.convert_resnet` can map reference checkpoints 1:1.

'pytorch' style = the 3x3 conv carries the stride (mmdet resnet.py); padding
is torch-centered (see layers.ConvBNReLU). NHWC layout throughout.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cmtcoop_tpu.models.layers import ConvBNReLU

# depth -> (block type, blocks per stage)
ARCH = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    bn_train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ConvBNReLU(self.planes, (3, 3), (self.stride,) * 2,
                         dtype=self.dtype, name="conv1")(x, self.bn_train)
        out = ConvBNReLU(self.planes, (3, 3), use_relu=False,
                         dtype=self.dtype, name="conv2")(out, self.bn_train)
        if self.downsample:
            identity = ConvBNReLU(
                self.planes, (1, 1), (self.stride,) * 2, use_relu=False,
                dtype=self.dtype, name="downsample")(x, self.bn_train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4), 'pytorch' style (stride on conv2)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    bn_train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ConvBNReLU(self.planes, (1, 1), dtype=self.dtype,
                         name="conv1")(x, self.bn_train)
        out = ConvBNReLU(self.planes, (3, 3), (self.stride,) * 2,
                         dtype=self.dtype, name="conv2")(out, self.bn_train)
        out = ConvBNReLU(self.planes * 4, (1, 1), use_relu=False,
                         dtype=self.dtype, name="conv3")(out, self.bn_train)
        if self.downsample:
            identity = ConvBNReLU(
                self.planes * 4, (1, 1), (self.stride,) * 2, use_relu=False,
                dtype=self.dtype, name="downsample")(x, self.bn_train)
        return nn.relu(out + identity)


def _max_pool_pad1(x):
    """torch MaxPool2d(3, stride=2, padding=1), floor mode."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


class ResNet(nn.Module):
    """Returns {'layer1'..'layer4'} feature dict; out_features selects which
    stages are kept (config out_indices (2,3) -> ('layer3','layer4'))."""
    depth: int = 50
    out_features: Sequence[str] = ("layer3", "layer4")
    norm_eval: bool = True   # config:197 — BN frozen during training
    with_cp: bool = True     # config:198 — per-block grad checkpointing
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        bn_train = train and not self.norm_eval
        block_t, stage_blocks = ARCH[self.depth]
        block_cls = BasicBlock if block_t == "basic" else Bottleneck
        if self.with_cp and train:
            # per-block rematerialization = the reference's with_cp
            block_cls = nn.remat(block_cls)
        expansion = 1 if block_t == "basic" else 4

        x = ConvBNReLU(64, (7, 7), (2, 2), dtype=self.dtype,
                       name="stem")(x, bn_train)
        x = _max_pool_pad1(x)

        outputs: Dict[str, jnp.ndarray] = {}
        in_ch = 64
        for si, n_blocks in enumerate(stage_blocks):
            planes = 64 * (2 ** si)
            stride = 1 if si == 0 else 2
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or in_ch != planes * expansion)
                x = block_cls(planes, s, need_ds, bn_train, self.dtype,
                              name=f"layer{si + 1}_{b}")(x)
                in_ch = planes * expansion
            name = f"layer{si + 1}"
            if name in self.out_features:
                outputs[name] = x
        return outputs
