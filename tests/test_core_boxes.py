"""Unit tests for the box codec and geometry core against torch oracles.

The oracle functions re-derive the reference formulas (cited in the module
docstrings) independently with numpy/torch so we validate numerics, not our
own code against itself.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cmtcoop_tpu.core import boxes as B
from cmtcoop_tpu.core.pos_embed import pos2embed, bev_grid_coords


def _rand_boxes(rng, n=32, dim=9):
    out = np.zeros((n, dim), np.float32)
    out[:, :3] = rng.uniform(-50, 50, (n, 3))
    out[:, 3:6] = rng.uniform(0.5, 10, (n, 3))
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    if dim > 7:
        out[:, 7:9] = rng.uniform(-5, 5, (n, 2))
    return out


def test_normalize_roundtrip(rng):
    bx = _rand_boxes(rng)
    code = np.asarray(B.normalize_bbox(jnp.asarray(bx)))
    assert code.shape == (32, 10)
    back = np.asarray(B.denormalize_bbox(jnp.asarray(code)))
    np.testing.assert_allclose(back[:, :6], bx[:, :6], rtol=1e-4, atol=1e-4)
    # yaw equal up to 2*pi wrap
    dyaw = np.mod(back[:, 6] - bx[:, 6] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dyaw, 0, atol=1e-5)
    np.testing.assert_allclose(back[:, 7:9], bx[:, 7:9], rtol=1e-5, atol=1e-5)


def test_normalize_matches_oracle(rng):
    torch = pytest.importorskip("torch")
    bx = _rand_boxes(rng)
    t = torch.from_numpy(bx)
    oracle = torch.cat(
        [t[:, 0:3], t[:, 3:6].log(), t[:, 6:7].sin(), t[:, 6:7].cos(),
         t[:, 7:9]], dim=-1).numpy()
    ours = np.asarray(B.normalize_bbox(jnp.asarray(bx)))
    np.testing.assert_allclose(ours, oracle, rtol=1e-6, atol=1e-6)


def test_gravity_center_shift(rng):
    bx = _rand_boxes(rng)
    g = np.asarray(B.bottom_to_gravity_center(jnp.asarray(bx)))
    np.testing.assert_allclose(g[:, 2], bx[:, 2] + bx[:, 5] / 2, rtol=1e-6)
    back = np.asarray(B.gravity_to_bottom_center(jnp.asarray(g)))
    np.testing.assert_allclose(back, bx, rtol=1e-6, atol=1e-6)


def test_transform_points_rigid(rng):
    pts = rng.normal(size=(100, 5)).astype(np.float32)
    ang = 0.7
    mat = np.eye(4, dtype=np.float32)
    mat[0, 0] = np.cos(ang); mat[0, 1] = -np.sin(ang)
    mat[1, 0] = np.sin(ang); mat[1, 1] = np.cos(ang)
    mat[:3, 3] = [1.0, -2.0, 3.0]
    out = np.asarray(B.transform_points(jnp.asarray(pts), jnp.asarray(mat)))
    exp = pts[:, :3] @ mat[:3, :3].T + mat[:3, 3]
    np.testing.assert_allclose(out[:, :3], exp, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[:, 3:], pts[:, 3:])
    # boxes transform consistently with points at box centers
    bx = _rand_boxes(rng)
    tb = np.asarray(B.transform_boxes(jnp.asarray(bx), jnp.asarray(mat)))
    np.testing.assert_allclose(
        tb[:, :3], bx[:, :3] @ mat[:3, :3].T + mat[:3, 3], rtol=1e-4,
        atol=1e-4)
    np.testing.assert_allclose(tb[:, 6], bx[:, 6] + ang, rtol=1e-5)


def test_inverse_sigmoid_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.uniform(-0.2, 1.2, 1000).astype(np.float32)
    ours = np.asarray(B.inverse_sigmoid(jnp.asarray(x)))
    xt = torch.from_numpy(x).clamp(0, 1)
    x1 = xt.clamp(min=1e-5)
    x2 = (1 - xt).clamp(min=1e-5)
    oracle = torch.log(x1 / x2).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_pos2embed_matches_oracle(rng):
    torch = pytest.importorskip("torch")
    import math
    pos_np = rng.uniform(0, 1, (4, 7, 2)).astype(np.float32)

    # oracle: reference cmt_head.py:40-50 formula
    pos = torch.from_numpy(pos_np) * (2 * math.pi)
    num_pos_feats = 128
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats + 1
    pos_x = pos[..., 0, None] / dim_t
    pos_y = pos[..., 1, None] / dim_t
    pos_x = torch.stack(
        (pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=-1).flatten(-2)
    pos_y = torch.stack(
        (pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=-1).flatten(-2)
    oracle = torch.cat((pos_y, pos_x), dim=-1).numpy()

    ours = np.asarray(pos2embed(jnp.asarray(pos_np), num_pos_feats=128))
    assert ours.shape == (4, 7, 256)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_bev_grid_coords_matches_oracle():
    torch = pytest.importorskip("torch")
    grid_size = [1440, 1440]
    ds = 8
    x_size, y_size = grid_size[1] // ds, grid_size[0] // ds
    by, bx = torch.meshgrid(
        torch.linspace(0, y_size - 1, y_size),
        torch.linspace(0, x_size - 1, x_size), indexing="ij")
    bx = (bx + 0.5) / x_size
    by = (by + 0.5) / y_size
    oracle = torch.cat([bx[None], by[None]], dim=0).view(2, -1).T.numpy()
    ours = np.asarray(bev_grid_coords(grid_size, ds))
    np.testing.assert_allclose(ours, oracle, rtol=1e-6, atol=1e-6)


def test_bev_pos2embed_grid_matches_dense():
    """Separable BEV PE table == pos2embed(bev_grid_coords(...)) exactly."""
    import jax.numpy as jnp
    from cmtcoop_tpu.core.pos_embed import (bev_grid_coords,
                                            bev_pos2embed_grid, pos2embed)

    for gs, ds, npf in [((64, 48), 8, 32), ((1440, 1440), 8, 256)]:
        dense = pos2embed(bev_grid_coords(gs, ds), npf)
        sep = bev_pos2embed_grid(gs, ds, npf)
        np.testing.assert_array_equal(np.asarray(dense), np.asarray(sep))
