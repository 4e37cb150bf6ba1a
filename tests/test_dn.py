"""DN-DETR denoising machinery: mask structure + noise invariants."""
import numpy as np
import jax
import jax.numpy as jnp

from cmtcoop_tpu.core.boxes import normalize_01
from cmtcoop_tpu.models.cmt_head import CmtHead, dn_attn_bias
from cmtcoop_tpu.ops.attention import NEG_INF


def _reference_mask(num_query, single_pad, groups):
    """Oracle: the reference's mask-construction loops
    (cmt_head.py:392-404), True = blocked."""
    pad = single_pad * groups
    tgt = pad + num_query
    m = np.zeros((tgt, tgt), bool)
    m[pad:, :pad] = True
    for i in range(groups):
        lo, hi = single_pad * i, single_pad * (i + 1)
        if i == 0:
            m[lo:hi, hi:pad] = True
        if i == groups - 1:
            m[lo:hi, :lo] = True
        else:
            m[lo:hi, hi:pad] = True
            m[lo:hi, :lo] = True
    return m


def test_dn_attn_bias_matches_reference_loops():
    for nq, sp, g in [(16, 4, 2), (32, 8, 3), (900, 40, 5)]:
        bias = np.asarray(dn_attn_bias(nq, sp, g))
        oracle = _reference_mask(nq, sp, g)
        np.testing.assert_array_equal(bias <= NEG_INF / 2, oracle)


def _head(noise_scale, split=0.75):
    return CmtHead(
        num_query=16, hidden_dim=32, in_channels=32, depth_num=8,
        pc_range=(-10.0, -10.0, -5.0, 10.0, 10.0, 5.0),
        grid_size=(16, 16), tasks=(("CAR", "TRUCK"),),
        max_gt=4, dn_groups=3, noise_scale=noise_scale, split=split,
        train_mode=True)


def _gt(rng, b=2, g=4):
    boxes = np.zeros((b, g, 9), np.float32)
    boxes[..., :2] = rng.uniform(-8, 8, (b, g, 2))
    boxes[..., 2] = rng.uniform(-4, 4, (b, g))
    boxes[..., 3:6] = rng.uniform(0.5, 3, (b, g, 3))
    labels = rng.integers(0, 2, (b, g))
    mask = np.ones((b, g), bool)
    return (jnp.asarray(boxes), jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(mask))


def test_prepare_for_dn_zero_noise_is_exact(rng):
    head = _head(noise_scale=0.0)
    boxes, labels, mask = _gt(rng)
    ref = jnp.zeros((16, 3))
    padded, info = head.prepare_for_dn(
        jax.random.PRNGKey(0), ref, boxes, labels, mask)
    assert info.pad_size == 12
    dn = np.asarray(padded[:, :12]).reshape(2, 3, 4, 3)
    expected = np.asarray(normalize_01(
        boxes[..., :3], head.pc_range))
    for grp in range(3):
        np.testing.assert_allclose(dn[:, grp], np.clip(expected, 0, 1),
                                   rtol=1e-5, atol=1e-6)
    # no noise -> no label flips
    np.testing.assert_array_equal(
        np.asarray(info.known_labels),
        np.asarray(info.known_labels_raw))


def test_prepare_for_dn_split_flips_labels(rng):
    head = _head(noise_scale=1.0, split=0.0)  # every noised box flips
    boxes, labels, mask = _gt(rng)
    ref = jnp.zeros((16, 3))
    _, info = head.prepare_for_dn(
        jax.random.PRNGKey(0), ref, boxes, labels, mask)
    # split=0 -> ||rand|| > 0 almost surely -> all background
    assert np.all(np.asarray(info.known_labels) == head.total_classes)
    assert np.all(np.asarray(info.known_labels_raw) < head.total_classes)
