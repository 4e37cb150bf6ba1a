"""Sparse conv machinery vs dense XLA conv oracles."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmtcoop_tpu.ops import sparse_utils as su
from cmtcoop_tpu.models.sparse_encoder import SparseEncoder

SHAPE = (5, 12, 12)  # (D, H, W)


def _random_grid(rng, n_active, cap):
    """Random sorted active set + features, padded to cap."""
    d, h, w = SHAPE
    lin = rng.choice(d * h * w, size=n_active, replace=False)
    lin = np.sort(lin)
    coords = np.stack([lin // (h * w), (lin // w) % h, lin % w], -1)
    pad = cap - n_active
    coords = np.concatenate(
        [coords, -np.ones((pad, 3), int)]).astype(np.int32)
    mask = np.zeros(cap, bool)
    mask[:n_active] = True
    feats = rng.normal(size=(cap, 4)).astype(np.float32)
    feats[~mask] = 0
    return coords, mask, feats


def _dense_from_sparse(coords, mask, feats):
    dense = np.zeros(SHAPE + (feats.shape[-1],), np.float32)
    for c, m, f in zip(coords, mask, feats):
        if m:
            dense[c[0], c[1], c[2]] = f
    return dense


def _oracle_conv(dense, weights, kernel, stride, padding):
    """lax conv oracle: weights (K, Cin, Cout) -> (kz,ky,kx,Cin,Cout)."""
    kz, ky, kx = kernel
    w = weights.reshape(kz, ky, kx, weights.shape[1], weights.shape[2])
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense)[None],          # NDHWC
        jnp.asarray(w),                    # DHWIO
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return np.asarray(out[0])


def test_subm_conv_matches_dense(rng):
    cap = 64
    coords, mask, feats = _random_grid(rng, 40, cap)
    grid = su.SparseGrid(jnp.asarray(coords), jnp.asarray(mask), SHAPE)
    nbr = su.subm_neighbor_map(grid)
    weights = rng.normal(size=(27, 4, 6)).astype(np.float32)
    out = np.asarray(su.gather_conv(
        jnp.asarray(feats), np.asarray(nbr), jnp.asarray(weights)))

    dense = _dense_from_sparse(coords, mask, feats)
    oracle = _oracle_conv(dense, weights, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    for i in range(cap):
        if mask[i]:
            z, y, x = coords[i]
            np.testing.assert_allclose(
                out[i], oracle[z, y, x], rtol=1e-4, atol=1e-4)
        else:
            np.testing.assert_allclose(out[i], 0.0)


def test_downsample_conv_matches_dense(rng):
    cap = 64
    coords, mask, feats = _random_grid(rng, 35, cap)
    grid = su.SparseGrid(jnp.asarray(coords), jnp.asarray(mask), SHAPE)
    for kernel, stride, padding in [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
    ]:
        out_grid = su.downsample_output_grid(grid, kernel, stride, padding,
                                             max_out=128)
        nbr = su.conv_neighbor_map(grid, out_grid, kernel, stride, padding)
        k = int(np.prod(kernel))
        weights = rng.normal(size=(k, 4, 5)).astype(np.float32)
        out = np.asarray(su.gather_conv(
            jnp.asarray(feats), np.asarray(nbr), jnp.asarray(weights)))

        dense = _dense_from_sparse(coords, mask, feats)
        oracle = _oracle_conv(dense, weights, kernel, stride, padding)

        ocoords = np.asarray(out_grid.coords)
        omask = np.asarray(out_grid.mask)
        # 1) value parity at active output sites
        for i in range(len(ocoords)):
            if omask[i]:
                z, y, x = ocoords[i]
                np.testing.assert_allclose(
                    out[i], oracle[z, y, x], rtol=1e-4, atol=1e-4)
        # 2) active output set == sites with any input coverage (spconv
        # SparseConv3d semantics)
        occ = (np.abs(_dense_from_sparse(
            coords, mask, np.ones((64, 1), np.float32))) > 0).astype(
                np.float32)
        cover = _oracle_conv(occ, np.ones((k, 1, 1), np.float32), kernel,
                             stride, padding)[..., 0]
        expected = {tuple(c) for c in np.argwhere(cover > 0.5)}
        got = {tuple(c) for c in ocoords[omask]}
        assert got == expected, (kernel, stride, padding)


@pytest.mark.slow
def test_sparse_encoder_shapes(rng):
    enc = SparseEncoder(
        sparse_shape=(41, 16, 16),
        base_channels=4,
        encoder_channels=((4, 4, 8), (8, 8, 8), (8, 8, 8), (8, 8)),
        output_channels=8,
        stage_caps=(64, 64, 64, 64),
    )
    b, v = 2, 96
    feats = rng.normal(size=(b, v, 5)).astype(np.float32)
    coords = np.full((b, v, 3), -1, np.int32)
    mask = np.zeros((b, v), bool)
    d, h, w = 41, 16, 16
    for bi in range(b):
        lin = np.sort(rng.choice(d * h * w, size=60, replace=False))
        cc = np.stack([lin // (h * w), (lin // w) % h, lin % w], -1)
        coords[bi, :60] = cc
        mask[bi, :60] = True
    feats[~mask] = 0

    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                         jnp.asarray(coords), jnp.asarray(mask))
    out = enc.apply(variables, jnp.asarray(feats), jnp.asarray(coords),
                    jnp.asarray(mask))
    # H/8 x W/8, channels = out*Dfinal; D: 5->3->2->1 then (3,1,1)s2p0 -> ...
    assert out.shape[0] == 2 and out.shape[1] == 2 and out.shape[2] == 2
    assert np.isfinite(np.asarray(out)).all()


def test_sorted_lookup_windowed_matches_exact(rng):
    """The TPU windowed-merge search vs exact searchsorted, on patterns that
    satisfy the density precondition (constant-shifted key sets)."""
    import jax.numpy as jnp
    from cmtcoop_tpu.ops.sparse_utils import sorted_lookup

    keys = np.unique(rng.choice(2_000_000, 5000, replace=False)).astype(
        np.int32)
    for shift in (0, 1, 1440, -1440, 1440 * 1440):
        q = np.sort(keys + shift).astype(np.int32)
        pe, he = sorted_lookup(jnp.asarray(keys), jnp.asarray(q),
                               exact=True)
        pw, hw_ = sorted_lookup(jnp.asarray(keys), jnp.asarray(q),
                                exact=False, block=64, window=512)
        np.testing.assert_array_equal(np.asarray(he), np.asarray(hw_))
        np.testing.assert_array_equal(
            np.asarray(pe)[np.asarray(he)], np.asarray(pw)[np.asarray(hw_)])

    # dense queries superset of keys (sparse_to_dense pattern)
    q = np.arange(0, 40000, dtype=np.int32)
    keys2 = np.unique(rng.choice(40000, 3000, replace=False)).astype(
        np.int32)
    pe, he = sorted_lookup(jnp.asarray(keys2), jnp.asarray(q), exact=True)
    pw, hw_ = sorted_lookup(jnp.asarray(keys2), jnp.asarray(q), exact=False,
                            block=128, window=256)
    np.testing.assert_array_equal(np.asarray(he), np.asarray(hw_))
    np.testing.assert_array_equal(np.asarray(pe), np.asarray(pw))
