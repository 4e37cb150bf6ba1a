"""Sparse 3D voxel encoder (mmdet3d SparseEncoder rebuild, TPU-native).

Reference graph (coop config pts_middle_encoder:243-251, mmdet3d 1.0.0rc6
SparseEncoder with block_type='basicblock'):

    conv_input: SubM(5->16, k3, p1) + BN1d + ReLU
    stage1: SBB(16) x2,  SpConv(16->32,  s2, p1)        + BN + ReLU
    stage2: SBB(32) x2,  SpConv(32->64,  s2, p1)        + BN + ReLU
    stage3: SBB(64) x2,  SpConv(64->128, s2, p(0,1,1))  + BN + ReLU
    stage4: SBB(128) x2
    conv_out: SpConv(128->128, k(3,1,1), s(2,1,1), p0)  + BN + ReLU
    .dense(): (D=2, 180, 180, 128) -> BEV (180, 180, 256)

where SBB = SparseBasicBlock (two SubM convs + residual) and all convs are
bias-free. Instead of spconv hash tables, neighbor maps come from sorted
binary search (`ops.sparse_utils`) and each conv is one gather + MXU matmul.
The submanifold neighbor map is computed once per stage and shared by every
SubM conv in it (= spconv `indice_key` reuse). All shapes are static; active
sets are padded to per-stage caps.
"""
from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cmtcoop_tpu.models.layers import MaskedBatchNorm
from cmtcoop_tpu.ops import sparse_utils as su

_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


# lax.map (not vmap) around the lookups: the exactness guard inside is a
# lax.cond that must stay a real branch (vmap -> select would execute the
# expensive exact fallback unconditionally)
def _batched_subm_map(coords, mask, shape, kernel):
    def one(cm):
        return su.subm_neighbor_map(
            su.SparseGrid(cm[0], cm[1], shape), kernel)
    return jax.lax.map(one, (coords, mask))


def _batched_downsample(coords, mask, shape, kernel, stride, padding,
                        max_out):
    def one(cm):
        c, m = cm
        g = su.downsample_output_grid(
            su.SparseGrid(c, m, shape), kernel, stride, padding, max_out)
        nbr = su.conv_neighbor_map(
            su.SparseGrid(c, m, shape), g, kernel, stride, padding)
        return g.coords, g.mask, nbr
    out_coords, out_mask, nbr = jax.lax.map(one, (coords, mask))
    out_shape = tuple(
        (shape[a] + 2 * padding[a] - kernel[a]) // stride[a] + 1
        for a in range(3))
    return out_coords, out_mask, nbr, out_shape


class SparseConv(nn.Module):
    """One sparse conv as gather + matmul; weights (K, Cin, Cout)."""
    features: int
    kernel_volume: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, nbr_idx):
        w = self.param(
            "kernel", _conv_init,
            (self.kernel_volume, feats.shape[-1], self.features),
            jnp.float32)
        return jax.vmap(
            lambda f, n: su.gather_conv(f, n, w.astype(self.dtype))
        )(feats.astype(self.dtype), nbr_idx)


class SparseConvBlock(nn.Module):
    """conv + masked BN + ReLU ('conv','norm','act' order, config:246)."""
    features: int
    kernel_volume: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, nbr_idx, mask, train: bool = False):
        x = SparseConv(self.features, self.kernel_volume,
                       self.dtype, name="conv")(feats, nbr_idx)
        x = MaskedBatchNorm(dtype=self.dtype, name="bn")(x, mask, train)
        return nn.relu(x)


class SparseBasicBlock(nn.Module):
    """ResNet BasicBlock over a fixed active set (mmdet3d SparseBasicBlock)."""
    features: int
    kernel_volume: int = 27
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, nbr_idx, mask, train: bool = False):
        identity = feats
        x = SparseConv(self.features, self.kernel_volume, self.dtype,
                       name="conv1")(feats, nbr_idx)
        x = MaskedBatchNorm(dtype=self.dtype, name="bn1")(x, mask, train)
        x = nn.relu(x)
        x = SparseConv(self.features, self.kernel_volume, self.dtype,
                       name="conv2")(x, nbr_idx)
        x = MaskedBatchNorm(dtype=self.dtype, name="bn2")(x, mask, train)
        return nn.relu(x + identity)


class SparseEncoder(nn.Module):
    """Voxel features (B, V, Cin) + coords -> dense BEV (B, H/8, W/8, 256)."""
    sparse_shape: Tuple[int, int, int] = (41, 1440, 1440)  # (D, H, W)
    base_channels: int = 16
    encoder_channels: Sequence[Sequence[int]] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    output_channels: int = 128
    # static caps on active-set size after each downsample
    stage_caps: Sequence[int] = (60000, 60000, 60000, 60000)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxel_feats, coords, mask, train: bool = False):
        shape = tuple(self.sparse_shape)
        x = voxel_feats.astype(self.dtype)

        nbr = _batched_subm_map(coords, mask, shape, (3, 3, 3))
        x = SparseConvBlock(self.base_channels, 27, self.dtype,
                            name="conv_input")(x, nbr, mask, train)

        # z-pad of each downsample conv, from encoder_paddings
        # ((0,0,1),(0,0,1),(0,0,[0,1,1]),(0,0)) — only the stride-2 convs
        # consume their entry (basicblock ignores padding), so the effective
        # downsample paddings are p1, p1, p(0,1,1).
        down_pads = [(1, 1, 1), (1, 1, 1), (0, 1, 1)]
        n_stages = len(self.encoder_channels)
        for i, blocks in enumerate(self.encoder_channels):
            ch = blocks[0]
            n_sbb = len(blocks) - (0 if i == n_stages - 1 else 1)
            for j in range(n_sbb):
                x = SparseBasicBlock(
                    ch, 27, self.dtype, name=f"stage{i}_block{j}")(
                        x, nbr, mask, train)
            if i != n_stages - 1:
                out_ch = blocks[-1]
                coords, mask, nbr_dn, shape = _batched_downsample(
                    coords, mask, shape, (3, 3, 3), (2, 2, 2), down_pads[i],
                    self.stage_caps[i])
                x = SparseConvBlock(
                    out_ch, 27, self.dtype, name=f"stage{i}_down")(
                        x, nbr_dn, mask, train)
                nbr = _batched_subm_map(coords, mask, shape, (3, 3, 3))

        # conv_out: (3,1,1) stride (2,1,1) pad 0, then densify
        coords, mask, nbr_out, shape = _batched_downsample(
            coords, mask, shape, (3, 1, 1), (2, 1, 1), (0, 0, 0),
            self.stage_caps[-1])
        x = SparseConvBlock(self.output_channels, 3, self.dtype,
                            name="conv_out")(x, nbr_out, mask, train)

        dense = jax.vmap(
            lambda c, m, f: su.sparse_to_dense(
                su.SparseGrid(c, m, shape), f))(coords, mask, x)
        # (B, D, H, W, C) -> (B, H, W, C*D) with channel-major-over-D layout
        # to match torch's view(N, C*D, H, W) (mmdet3d sparse_encoder.py)
        b, d, h, w, c = dense.shape
        return dense.transpose(0, 2, 3, 4, 1).reshape(b, h, w, c * d)
