"""GridMask device-side augmentation (reference grid_mask.py:70-124)."""
import numpy as np
import jax
import jax.numpy as jnp

from cmtcoop_tpu.models.grid_mask import grid_mask


def _imgs():
    return jnp.ones((2, 64, 96, 3), jnp.float32)


def test_masks_zero_bands_and_keeps_rest():
    out = np.asarray(grid_mask(jax.random.PRNGKey(3), _imgs(), prob=1.0))
    vals = np.unique(out)
    assert set(vals.tolist()) <= {0.0, 1.0}
    frac = out.mean()
    # mode=1 keeps the band union; ratio=0.5 -> keep fraction in (0.4, 1.0)
    assert 0.3 < frac < 1.0
    # same mask across batch and channels
    assert np.array_equal(out[0], out[1])
    assert np.array_equal(out[..., 0], out[..., 1])


def test_prob_zero_is_identity():
    out = grid_mask(jax.random.PRNGKey(0), _imgs(), prob=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.ones((2, 64, 96, 3)))


def test_deterministic_per_key():
    a = grid_mask(jax.random.PRNGKey(7), _imgs(), prob=1.0)
    b = grid_mask(jax.random.PRNGKey(7), _imgs(), prob=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rotate_default_matches_rotate1():
    """At the reference's configured rotate=1, r==0 always
    (np.random.randint(1)==0) so rotation must be an exact no-op."""
    a = grid_mask(jax.random.PRNGKey(5), _imgs(), prob=1.0, rotate=1)
    b = grid_mask(jax.random.PRNGKey(5), _imgs(), prob=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rotate_rotates_band_lattice():
    """rotate=90 with a key whose sampled r is nonzero produces a mask
    that is NOT axis-aligned (some row mixes bands at an angle), yet keeps
    a similar masked fraction."""
    imgs = jnp.ones((1, 128, 128, 1), jnp.float32)
    base = np.asarray(grid_mask(jax.random.PRNGKey(11), imgs, prob=1.0,
                                rotate=1))[0, :, :, 0]
    rot = None
    for seed in range(20):
        r = np.asarray(grid_mask(jax.random.PRNGKey(seed), imgs, prob=1.0,
                                 rotate=90))[0, :, :, 0]
        same_key_base = np.asarray(grid_mask(
            jax.random.PRNGKey(seed), imgs, prob=1.0, rotate=1))[0, :, :, 0]
        if not np.array_equal(r, same_key_base):
            rot = r
            break
    assert rot is not None, "no seed produced a nonzero rotation in 20 draws"
    # masked fraction is rotation-invariant up to edge effects
    assert abs(rot.mean() - same_key_base.mean()) < 0.2
    assert base.shape == rot.shape
