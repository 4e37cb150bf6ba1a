"""Pillar-dense encoder vs gather encoder: same params, same function."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from cmtcoop_tpu.models.pillar_encoder import PillarSparseEncoder
from cmtcoop_tpu.models.sparse_encoder import SparseEncoder

CFG = dict(
    sparse_shape=(41, 16, 16),
    base_channels=4,
    encoder_channels=((4, 4, 8), (8, 8, 8), (8, 8, 8), (8, 8)),
    output_channels=8,
)


def _voxels(rng, b=2, v=96, n_active=60):
    d, h, w = CFG["sparse_shape"]
    feats = np.zeros((b, v, 5), np.float32)
    coords = np.full((b, v, 3), -1, np.int32)
    mask = np.zeros((b, v), bool)
    for bi in range(b):
        lin = np.sort(rng.choice(d * h * w, n_active, replace=False))
        coords[bi, :n_active] = np.stack(
            [lin // (h * w), (lin // w) % h, lin % w], -1)
        mask[bi, :n_active] = True
        feats[bi, :n_active] = rng.normal(
            size=(n_active, 5)).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask)


@pytest.mark.slow
def test_pillar_matches_gather_encoder(rng):
    feats, coords, mask = _voxels(rng)
    ref = SparseEncoder(stage_caps=(512, 512, 512, 512), **CFG)
    fast = PillarSparseEncoder(pillar_caps=(256, 256, 256, 256), **CFG)

    variables = ref.init(jax.random.PRNGKey(0), feats, coords, mask)
    out_ref = ref.apply(variables, feats, coords, mask)
    out_fast = fast.apply(variables, feats, coords, mask)

    assert out_ref.shape == out_fast.shape
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pillar_param_tree_matches(rng):
    feats, coords, mask = _voxels(rng, b=1)
    ref = SparseEncoder(stage_caps=(96,) * 4, **CFG)
    fast = PillarSparseEncoder(pillar_caps=(128,) * 4, **CFG)
    pr = ref.init(jax.random.PRNGKey(0), feats, coords, mask)
    pf = fast.init(jax.random.PRNGKey(0), feats, coords, mask)
    sr = jax.tree_util.tree_structure(pr)
    sf = jax.tree_util.tree_structure(pf)
    assert sr == sf
    for a, b in zip(jax.tree.leaves(pr), jax.tree.leaves(pf)):
        assert a.shape == b.shape
