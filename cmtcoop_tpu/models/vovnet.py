"""VoVNet image backbone (reference models/backbones/vovnet.py rebuild).

Supports the V-19/39/57/99 eSE specs; configs use 'V-99-eSE' with
out_features ('stage4', 'stage5') -> channels (768, 1024)
(coop config:221-227). NHWC layout; OSA concat-aggregation maps well onto
XLA fusion, eSE is a squeeze-excite with hard-sigmoid.

Note the reference's forward applies eSE in *every* OSA block regardless of
the SE flag (vovnet.py:228-240); we reproduce that.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cmtcoop_tpu.models.layers import ConvBNReLU

STAGE_SPECS: Dict[str, dict] = {
    "V-19-slim-eSE": dict(
        stem=(64, 64, 128), stage_conv_ch=(64, 80, 96, 112),
        stage_out_ch=(112, 256, 384, 512), layer_per_block=3,
        block_per_stage=(1, 1, 1, 1)),
    "V-19-eSE": dict(
        stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
        stage_out_ch=(256, 512, 768, 1024), layer_per_block=3,
        block_per_stage=(1, 1, 1, 1)),
    "V-39-eSE": dict(
        stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
        stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
        block_per_stage=(1, 1, 2, 2)),
    "V-57-eSE": dict(
        stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
        stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
        block_per_stage=(1, 1, 4, 3)),
    "V-99-eSE": dict(
        stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
        stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
        block_per_stage=(1, 3, 9, 3)),
}


def _max_pool_ceil(x):
    """3x3 stride-2 max pool with torch ceil_mode=True semantics."""
    import jax
    n, h, w, c = x.shape
    pad_h = (h - 3) % 2
    pad_w = (w - 3) % 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])


class eSEModule(nn.Module):
    """Effective squeeze-excite: GAP -> 1x1 conv -> hsigmoid -> scale."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                    name="fc")(s)
        s = nn.relu6(s + 3.0) / 6.0
        return x * s


class OSAModule(nn.Module):
    stage_ch: int
    concat_ch: int
    layer_per_block: int
    identity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity_feat = x
        outputs = [x]
        for i in range(self.layer_per_block):
            x = ConvBNReLU(self.stage_ch, (3, 3), dtype=self.dtype,
                           name=f"conv{i}")(x, train)
            outputs.append(x)
        x = jnp.concatenate(outputs, axis=-1)
        x = ConvBNReLU(self.concat_ch, (1, 1), dtype=self.dtype,
                       name="concat")(x, train)
        x = eSEModule(self.dtype, name="ese")(x)
        if self.identity:
            x = x + identity_feat
        return x


class VoVNet(nn.Module):
    spec_name: str = "V-99-eSE"
    out_features: Sequence[str] = ("stage4", "stage5")
    input_ch: int = 3
    norm_eval: bool = True  # reference freezes BN at train (vovnet.py:381-390)
    # per-OSA-block rematerialization for training: the reference only
    # checkpoints decoder layers (petr_transformer.py:404-487) and trains
    # in 22+ GB on GPUs; a 16 GB v5e needs the backbone's OSA activations
    # recomputed too (r5 OOM finding, runs/tpu_probe.log). Safe because
    # norm_eval freezes BN at train — blocks are pure.
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        train = train and not self.norm_eval
        spec = STAGE_SPECS[self.spec_name]
        stem_ch = spec["stem"]
        x = ConvBNReLU(stem_ch[0], (3, 3), (2, 2), dtype=self.dtype,
                       name="stem1")(x, train)
        x = ConvBNReLU(stem_ch[1], (3, 3), (1, 1), dtype=self.dtype,
                       name="stem2")(x, train)
        x = ConvBNReLU(stem_ch[2], (3, 3), (2, 2), dtype=self.dtype,
                       name="stem3")(x, train)
        outputs = {}
        if "stem" in self.out_features:
            outputs["stem"] = x
        for i in range(4):
            name = f"stage{i + 2}"
            if i != 0:
                x = _max_pool_ceil(x)
            n_blocks = spec["block_per_stage"][i]
            osa_cls = (nn.remat(OSAModule, static_argnums=(2,))
                       if self.remat else OSAModule)
            for b in range(n_blocks):
                x = osa_cls(
                    spec["stage_conv_ch"][i], spec["stage_out_ch"][i],
                    spec["layer_per_block"], identity=b > 0,
                    dtype=self.dtype, name=f"{name}_block{b}")(x, train)
            if name in self.out_features:
                outputs[name] = x
        return outputs


class CPFPN(nn.Module):
    """Checkpoint-friendly FPN (reference models/necks/cp_fpn.py:11-204):
    lateral 1x1 conv per level, 3x3 fpn conv only on level 0, nearest
    top-down upsampling. Configs: in [768, 1024] -> out 256, num_outs 2."""
    out_channels: int = 256
    num_outs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray],
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name=f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            # crop in case of odd shapes (nearest upsample to exact size)
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=True,
                    dtype=self.dtype, name="fpn0")(laterals[0])
        ]
        outs.extend(laterals[1:self.num_outs])
        return tuple(outs)
