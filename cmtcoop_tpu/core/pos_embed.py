"""3D-coordinate positional encodings — the glue of CMT's modality alignment.

CMT has no view transformation: LiDAR BEV tokens, image tokens and queries are
aligned purely through sin/cos embeddings of 3D coordinates
(reference cmt_head.py:40-50 `pos2embed`, :417-433 `_rv_pe`,
:439-467 `_rv_query_embed`). This module reproduces that math in jnp.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def pos2embed(pos: jnp.ndarray, num_pos_feats: int = 128) -> jnp.ndarray:
    """Sin/cos embedding of 2D positions in [0, 1].

    Matches reference cmt_head.py:40-50 exactly:
      - scale by 2*pi
      - divisor dim_t = 2*(i//2)/num_pos_feats + 1  (linear, not geometric!)
      - interleave sin of even channels with cos of odd channels
      - output = concat(embed_y, embed_x), size 2*num_pos_feats

    Args:
        pos: (..., 2) positions, normally in [0, 1].
    Returns:
        (..., 2*num_pos_feats) embedding.
    """
    scale = 2.0 * math.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = 2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats + 1.0

    def _embed(p):  # p: (...,) -> (..., num_pos_feats)
        v = p[..., None] / dim_t
        return jnp.stack(
            [jnp.sin(v[..., 0::2]), jnp.cos(v[..., 1::2])], axis=-1
        ).reshape(*v.shape[:-1], -1)

    emb_x = _embed(pos[..., 0])
    emb_y = _embed(pos[..., 1])
    return jnp.concatenate([emb_y, emb_x], axis=-1)


def bev_grid_coords(grid_size_xy, downsample_scale: int) -> jnp.ndarray:
    """Normalized BEV cell-center coordinates, row-major over (y, x).

    Matches reference cmt_head.py:324-337 `coords_bev`: for a feature map of
    (y_size, x_size) = grid_size/downsample, returns (y_size*x_size, 2) with
    coords (x+0.5)/x_size, (y+0.5)/y_size, y varying slowest.
    """
    x_size = grid_size_xy[1] // downsample_scale
    y_size = grid_size_xy[0] // downsample_scale
    xs = (jnp.arange(x_size, dtype=jnp.float32) + 0.5) / x_size
    ys = (jnp.arange(y_size, dtype=jnp.float32) + 0.5) / y_size
    gx = jnp.tile(xs[None, :], (y_size, 1))
    gy = jnp.tile(ys[:, None], (1, x_size))
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def bev_pos2embed_grid(grid_size_xy, downsample_scale: int,
                       num_pos_feats: int = 128) -> jnp.ndarray:
    """pos2embed(bev_grid_coords(...)) computed separably.

    The embedding of cell (y, x) is concat(embed(y), embed(x)) — each axis
    independent — so the (H*W, 2*npf) table needs sin/cos for only H + W
    distinct values broadcast over the grid (at 180x180 that is 92k
    transcendentals instead of 33M; the dense form cost ~5 ms/agent on TPU
    because the table is too large for XLA constant folding). Bit-identical
    to the dense composition (tested)."""
    scale = 2.0 * math.pi
    x_size = grid_size_xy[1] // downsample_scale
    y_size = grid_size_xy[0] // downsample_scale
    xs = (jnp.arange(x_size, dtype=jnp.float32) + 0.5) / x_size * scale
    ys = (jnp.arange(y_size, dtype=jnp.float32) + 0.5) / y_size * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = 2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats + 1.0

    def _embed(p):
        v = p[:, None] / dim_t
        return jnp.stack(
            [jnp.sin(v[:, 0::2]), jnp.cos(v[:, 1::2])], axis=-1
        ).reshape(p.shape[0], -1)

    e_y = _embed(ys)  # (y_size, npf)
    e_x = _embed(xs)  # (x_size, npf)
    table = jnp.concatenate([
        jnp.broadcast_to(e_y[:, None, :], (y_size, x_size, num_pos_feats)),
        jnp.broadcast_to(e_x[None, :, :], (y_size, x_size, num_pos_feats)),
    ], axis=-1)
    return table.reshape(y_size * x_size, 2 * num_pos_feats)


def frustum_coords(
    feat_hw, pad_hw, depth_num: int, max_range: float
) -> jnp.ndarray:
    """Camera-frustum sample coordinates for the RV positional encoding.

    Matches reference cmt_head.py:417-427 `_rv_pe` head: a (H, W, D, 4)
    homogeneous grid where (u, v) are pixel centers scaled to the padded image
    and depths are `1 + d*(pc_range[3]-1)/depth_num`; (u, v) are multiplied by
    depth so that lidar2img^-1 can be applied directly.
    """
    h, w = feat_hw
    pad_h, pad_w = pad_hw
    coords_h = jnp.arange(h, dtype=jnp.float32) * pad_h / h
    coords_w = jnp.arange(w, dtype=jnp.float32) * pad_w / w
    coords_d = 1.0 + jnp.arange(depth_num, dtype=jnp.float32) * (
        max_range - 1.0
    ) / depth_num
    hh = jnp.broadcast_to(coords_h[:, None, None], (h, w, depth_num))
    ww = jnp.broadcast_to(coords_w[None, :, None], (h, w, depth_num))
    dd = jnp.broadcast_to(coords_d[None, None, :], (h, w, depth_num))
    ones = jnp.ones_like(dd)
    coords = jnp.stack([ww, hh, dd, ones], axis=-1)
    uv_times_d = coords[..., :2] * coords[..., 2:3]
    return jnp.concatenate([uv_times_d, coords[..., 2:]], axis=-1)


def depth_bins(depth_num: int, max_range: float) -> jnp.ndarray:
    """The shared depth-bin ladder (cmt_head.py:422, 458)."""
    return 1.0 + jnp.arange(depth_num, dtype=jnp.float32) * (
        max_range - 1.0
    ) / depth_num
