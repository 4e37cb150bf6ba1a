"""GridMask image augmentation, device-side and jit-safe.

The reference builds the grid mask with numpy+PIL on the CPU per forward call
(models/utils/grid_mask.py:70-124, applied in CmtDetector.extract_img_feat at
cmt.py:46-69 with use_h/w=True, rotate=1, offset=False, ratio=0.5, mode=1,
prob=0.7). TPU-native version: the mask is computed on device from a PRNG
key, so image batches never bounce back to the host. Rotation is omitted
(reference uses rotate=1 => a random rotation of up to 1 degree — visually a
no-op) and documented here as an intentional deviation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(
    key: jax.Array,
    imgs: jnp.ndarray,
    prob: float = 0.7,
    ratio: float = 0.5,
    mode: int = 1,
) -> jnp.ndarray:
    """Apply GridMask to (N, H, W, C) images.

    d ~ U[2, min(H, W)); l = round(d * ratio); the kept/zeroed checkerboard
    of period d starts at a random offset; mode=1 inverts the mask
    (grid_mask.py:96-116).
    """
    n, h, w, c = imgs.shape
    k_apply, k_d, k_sx, k_sy = jax.random.split(key, 4)
    apply_it = jax.random.uniform(k_apply) < prob
    d = jax.random.randint(k_d, (), 2, min(h, w))
    l = jnp.maximum((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32),
                    1)
    sx = jax.random.randint(k_sx, (), 0, 1 << 30) % d
    sy = jax.random.randint(k_sy, (), 0, 1 << 30) % d

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_band_y = ((ys - sy) % d) < l
    in_band_x = ((xs - sx) % d) < l
    mask = ~(in_band_y | in_band_x)  # 0 inside the bands
    if mode == 1:
        mask = ~mask
    keep = jnp.where(apply_it, mask, True)
    return imgs * keep[None, :, :, None].astype(imgs.dtype)
