"""Channels-first fused conv stack vs XLA conv / flax VoVNet oracles.

The Pallas kernels run in interpret mode on CPU (tiny shapes); shape
coverage includes non-multiple H, wide-Cin (rt auto-shrink), residual
fusion, chained convs (layout reuse), the fused OSA aggregate, and the
full vovnet_cf forward vs the flax module (reference
models/backbones/vovnet.py:278-390).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cmtcoop_tpu.ops.conv_cf import (conv3x3_cf, from_cf, lane_mask,
                                     osa_agg_cf, to_cf)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@pytest.mark.parametrize("mstack", [False, True])
@pytest.mark.parametrize("v,h,w,cin,cout,relu,resid", [
    (1, 16, 24, 8, 16, True, False),
    (2, 16, 20, 16, 8, False, False),
    (1, 13, 50, 32, 16, True, False),     # H % rt != 0
    (1, 11, 10, 16, 16, True, True),      # residual
])
def test_conv3x3_cf(v, h, w, cin, cout, relu, resid, mstack):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(v, h, w, cin)), jnp.float32)
    wt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
    bias = jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32)

    ref = xla_conv(x, wt) * scale + bias
    rs = None
    if resid:
        rs_nhwc = jnp.asarray(rng.normal(size=(v, h, w, cout)), jnp.float32)
        ref = ref + rs_nhwc
        rs = to_cf(rs_nhwc)
    if relu:
        ref = jnp.maximum(ref, 0.0)

    out = conv3x3_cf(to_cf(x), wt, h, w, scale=scale, bias=bias,
                     relu=relu, residual=rs, mstack=mstack,
                     interpret=True)
    got = from_cf(out, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_cf_chain_and_wide_cin():
    """Chained convs reuse the layout; cin > threshold exercises the
    rt auto-shrink branch."""
    rng = np.random.default_rng(1)
    v, h, w = 1, 16, 12
    x = jnp.asarray(rng.normal(size=(v, h, w, 24)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 24, 16)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 16, 8)) * 0.1, jnp.float32)
    ref = xla_conv(jnp.maximum(xla_conv(x, w1), 0).astype(jnp.float32), w2)

    y = conv3x3_cf(to_cf(x), w1, h, w, relu=True, interpret=True)
    y = conv3x3_cf(y, w2, h, w, relu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(from_cf(y, h, w)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_osa_agg_cf():
    rng = np.random.default_rng(2)
    v, h, w = 2, 10, 14
    cs = (8, 16, 8)
    cout = 16
    parts_nhwc = [jnp.asarray(rng.normal(size=(v, h, w, c)), jnp.float32)
                  for c in cs]
    weights = jnp.asarray(rng.normal(size=(sum(cs), cout)) * 0.1,
                          jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
    bias = jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32)

    cat = jnp.concatenate(parts_nhwc, axis=-1)
    ref = jnp.maximum(jnp.einsum("vhwc,co->vhwo", cat, weights)
                      * scale + bias, 0.0)
    gap_ref = jnp.sum(ref, axis=(1, 2))

    parts = [to_cf(p) for p in parts_nhwc]
    out, gap = osa_agg_cf(parts, weights, scale, bias, h, w,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(from_cf(out, h, w)),
                               np.asarray(ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gap), np.asarray(gap_ref),
                               rtol=1e-4, atol=1e-4)


def test_lane_mask():
    m = np.asarray(lane_mask(5, 10))
    from cmtcoop_tpu.ops.conv_cf import plan_nl, plan_wp
    wp = plan_wp(10)
    assert m.sum() == 5 * 10
    grid = m.reshape(-1, wp)
    assert grid[:5, :10].all() and grid[5:].sum() == 0


@pytest.mark.parametrize("impl", ["wpack", "wpack_cf2"])
def test_wpack_stem_matches_flax(impl):
    """Width-packed stem (free-reshape column packing, rearranged
    kernels) is bit-near-exact vs the flax stem convs."""
    from cmtcoop_tpu.models.vovnet import VoVNet
    from cmtcoop_tpu.models.vovnet_cf import vovnet_cf
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)), jnp.float32)
    net = VoVNet("V-19-slim-eSE", ("stem",), dtype=jnp.float32)
    varz = net.init(jax.random.PRNGKey(0), x, False)
    ref = net.apply(varz, x, False)["stem"]
    got = vovnet_cf(varz, x, "V-19-slim-eSE", ("stem",),
                    dtype=jnp.float32, stem_impl=impl,
                    stop_after="stem")["_debug"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv_bn_relu_cf_matches_module():
    """Head shared_conv eval fast path (layers.conv_bn_relu_cf) vs the
    flax ConvBNReLU module with running BN statistics."""
    from cmtcoop_tpu.models.layers import ConvBNReLU, conv_bn_relu_cf
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 12, 18, 24)), jnp.float32)
    mod = ConvBNReLU(16, (3, 3), dtype=jnp.float32)
    varz = mod.init(jax.random.PRNGKey(0), x, False)
    # non-trivial running stats
    varz = jax.tree.map(lambda v: v, varz)
    bs = varz["batch_stats"]["BatchNorm_0"]
    bs["mean"] = jnp.asarray(rng.normal(size=16) * 0.3, jnp.float32)
    bs["var"] = jnp.asarray(rng.uniform(0.5, 2.0, 16), jnp.float32)
    ref = mod.apply(varz, x, False)
    got = conv_bn_relu_cf(varz, x, jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_vovnet_cf_matches_flax():
    from cmtcoop_tpu.models.vovnet import VoVNet
    from cmtcoop_tpu.models.vovnet_cf import vovnet_cf
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    feats = ("stage4", "stage5")
    net = VoVNet("V-19-slim-eSE", feats, dtype=jnp.float32)
    varz = net.init(jax.random.PRNGKey(0), x, False)
    ref = net.apply(varz, x, False)
    with jax.default_matmul_precision("highest"):
        got = vovnet_cf(varz, x, "V-19-slim-eSE", feats,
                        dtype=jnp.float32)
    for k in feats:
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        assert r.shape == g.shape
        np.testing.assert_allclose(g, r, rtol=2e-3, atol=2e-3)
