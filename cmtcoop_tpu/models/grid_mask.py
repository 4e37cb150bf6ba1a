"""GridMask image augmentation, device-side and jit-safe.

The reference builds the grid mask with numpy+PIL on the CPU per forward call
(models/utils/grid_mask.py:70-124, applied in CmtDetector.extract_img_feat at
cmt.py:46-69 with use_h/w=True, rotate=1, offset=False, ratio=0.5, mode=1,
prob=0.7). TPU-native version: the mask is computed on device from a PRNG
key, so image batches never bounce back to the host.

Rotation note: the reference samples `r = np.random.randint(rotate)` then
`mask.rotate(r)` (grid_mask.py:108-110). At the configured rotate=1 this is
ALWAYS r=0 — a mathematical no-op — so the default path here matches the
reference exactly. For completeness rotate>1 is supported too, as an exact
analytic rotation of the band pattern (PIL rotates the oversized 1.5x mask
about its center then center-crops; since the band phase (sx, sy) is uniform
over the period d, rotating the band lattice about the image center is
distributionally identical).
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
    rotate: int = 1,
) -> jnp.ndarray:
    """Apply GridMask to (N, H, W, C) images.

    d ~ U[2, min(H, W)); l = round(d * ratio); the kept/zeroed checkerboard
    of period d starts at a random offset; mode=1 inverts the mask
    (grid_mask.py:96-116); the mask is rotated by r ~ U{0..rotate-1} degrees
    (identity at the reference's configured rotate=1).
    """
    n, h, w, c = imgs.shape
    k_apply, k_d, k_sx, k_sy, k_rot = jax.random.split(key, 5)
    apply_it = jax.random.uniform(k_apply) < prob
    d = jax.random.randint(k_d, (), 2, min(h, w))
    l = jnp.maximum((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32),
                    1)
    sx = jax.random.randint(k_sx, (), 0, 1 << 30) % d
    sy = jax.random.randint(k_sy, (), 0, 1 << 30) % d

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    if rotate > 1:
        r = jax.random.randint(k_rot, (), 0, rotate)
        th = r.astype(jnp.float32) * (jnp.pi / 180.0)
        cth, sth = jnp.cos(th), jnp.sin(th)
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        yf = ys.astype(jnp.float32) - cy
        xf = xs.astype(jnp.float32) - cx
        # inverse-rotate pixel coords into band space (nearest sampling)
        xr = jnp.floor(cth * xf + sth * yf + cx).astype(jnp.int32)
        yr = jnp.floor(-sth * xf + cth * yf + cy).astype(jnp.int32)
        ys, xs = yr, xr
    in_band_y = ((ys - sy) % d) < l
    in_band_x = ((xs - sx) % d) < l
    mask = ~(in_band_y | in_band_x)  # 0 inside the bands
    if mode == 1:
        mask = ~mask
    keep = jnp.where(apply_it, mask, True)
    return imgs * keep[None, :, :, None].astype(imgs.dtype)
