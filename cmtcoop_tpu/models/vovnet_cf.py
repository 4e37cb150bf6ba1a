"""Channels-first fused-eval forward for VoVNet (TPU fast path).

A pure function over the flax `VoVNet` variable tree (same params /
batch_stats — nothing new to train or convert): stem convs run
width-packed (columns folded into channels by free reshapes — fills the
128 lanes that a 3/64-channel conv would pad), every OSA 3x3 conv runs through the
`conv3x3_cf` Pallas kernel (K packs 3*Cin: no 128-lane channel padding,
measured 39% -> 60%+ of bf16 peak at VoVNet-99's 160-224 channel counts),
and the OSA concat+1x1 aggregate is rewritten as a concat-free sum of
channels-first matmuls (the NHWC concat materializes ~135 MB/block at
stage3). The cf layout threads through whole stages with NO guard-pad or
slice copies (the kernel maintains its own zero lead/tail blocks); eSE
and max-pool stay channels-first; layout converts once on entry and once
per emitted stage output.

Used by FeatureExtractor.extract_img_feat at eval on TPU; training/init
use the flax module (reference models/backbones/vovnet.py:278-390).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from cmtcoop_tpu.models.vovnet import STAGE_SPECS
from cmtcoop_tpu.ops.conv_cf import (conv3x3_cf, from_cf, osa_agg_cf,
                                     plan_nl, plan_wp, to_cf)

BN_EPS = 1e-5


def _fold_bn(p, bs):
    """eval-mode BN -> (scale, bias) affine."""
    scale = p["scale"] * jax.lax.rsqrt(bs["var"] + BN_EPS)
    bias = p["bias"] - bs["mean"] * scale
    return scale, bias


def _convbn_xla(x, p, bs, stride, relu=True, dtype=jnp.bfloat16):
    """Torch-padded conv + folded BN via XLA (stem convs)."""
    k = p["Conv_0"]["kernel"].astype(dtype)
    kh, kw = k.shape[:2]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    scale, bias = _fold_bn(p["BatchNorm_0"], bs["BatchNorm_0"])
    y = y * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(dtype)


def _convbn_s2_wpacked(x_nhwc, p, bs, dtype=jnp.bfloat16):
    """3x3 stride-2 conv via width-packing: the free reshape
    (W, C) -> (W/2, 2C) turns the stride-2 w axis into stride 1 with a
    3x2 kernel over 2C input channels (output col j reads orig cols
    2j-1, 2j, 2j+1 = w/2-blocks (j-1, phase 1), (j, phase 0/1) -> kw=2
    taps, left pad 1). No data movement, doubles MXU lane occupancy;
    measured 2.8 -> 2.0 ms on stem3 (64->128 @ 4x320x800), and the
    probe showed a FULL space-to-depth transpose is a net loss (the
    (.., 2, 2, C) transpose costs more than the conv saves)."""
    v, h, w, c = x_nhwc.shape
    assert h % 2 == 0 and w % 2 == 0
    k = p["Conv_0"]["kernel"]                        # (3, 3, C, Co)
    co = k.shape[-1]
    x = x_nhwc.reshape(v, h, w // 2, 2 * c).astype(dtype)
    k2 = jnp.zeros((3, 2, 2 * c, co), k.dtype)
    for dj in range(3):
        qb, qq = {0: (0, 1), 1: (1, 0), 2: (1, 1)}[dj]
        k2 = k2.at[:, qb, qq * c:(qq + 1) * c].set(k[:, dj])
    y = jax.lax.conv_general_dilated(
        x, k2.astype(dtype), (2, 1), ((1, 1), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    scale, bias = _fold_bn(p["BatchNorm_0"], bs["BatchNorm_0"])
    return jnp.maximum(y * scale + bias, 0.0).astype(dtype)


def _wpack_kernel(k, s, pi, po, pl=1):
    """Rearrange (kh, kw, Cin, Cout) into the width-packed
    (kh, kw2, Pi*Cin, Po*Cout) kernel (taps map to (block offset t,
    in-block column q): q + Pi*t = s*p - pl + dx). Returns (k2, tmin)."""
    kh, kw, cin, cout = k.shape
    taps = [(dx, px) for px in range(po) for dx in range(kw)]
    ts = [(s * px - pl + dx) // pi for dx, px in taps]
    tmin, tmax = min(ts), max(ts)
    kw2 = tmax - tmin + 1
    k2 = jnp.zeros((kh, kw2, pi * cin, po * cout), k.dtype)
    for dx in range(kw):
        for px in range(po):
            g = s * px - pl + dx
            t, q = g // pi - tmin, g % pi
            k2 = k2.at[:, t, q * cin:(q + 1) * cin,
                       px * cout:(px + 1) * cout].set(k[:, dx])
    return k2, tmin, tmax


def _wpack_conv(x, p, bs, kh, s, pi, po, pl=1, dtype=jnp.bfloat16):
    """Width-packed conv+BN+ReLU: `x` is (V, H, WB, Pi*Cin) — Pi image
    columns folded into channels (a FREE reshape of NHWC row-major data).
    Requires s * Po == Pi, which turns the width stride into pure
    packing: the output is (V, H', WB', Po*Cout) with width stride 1.

    Why: the VoVNet stem's 3/64-channel convs run at <20% efficiency on
    TPU — the (8,128) tile pads the minor channel dim 3->128 (a measured
    4.1 ms relayout copy of the input + 2.4 ms stem1 at bench shapes,
    tools/probe_trace.py). Packing columns into channels fills the lanes
    with REAL data; the rearranged kernel computes bit-identical math
    (taps map to (block offset t, in-block column q): q + Pi*t =
    s*p - pl + dx)."""
    k = p["Conv_0"]["kernel"]                        # (kh, kw, Cin, Cout)
    cin, cout = k.shape[2], k.shape[3]
    assert s * po == pi and x.shape[-1] == pi * cin
    k2, tmin, tmax = _wpack_kernel(k, s, pi, po, pl)
    ph = (kh - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k2.astype(dtype), (s, 1),
        ((ph, ph), (-tmin, max(tmax, 0))),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    scale, bias = _fold_bn(p["BatchNorm_0"], bs["BatchNorm_0"])
    sc = jnp.tile(scale, po)
    bi = jnp.tile(bias, po)
    return jnp.maximum(y * sc + bi, 0.0).astype(dtype)


def _stem_wpack(x_nhwc, p, bs, dtype=jnp.bfloat16, cf2: bool = True):
    """All three stem convs width-packed; returns standard NHWC
    (V, H/4, W/4, 128). Every repack between convs is a free reshape
    (pack-major column order == row-major width order)."""
    v, h, w, c = x_nhwc.shape
    assert c == 3 and h % 4 == 0 and w % 16 == 0
    x = x_nhwc.reshape(v, h, w // 4, 12)             # pack4, free
    x = _wpack_conv(x, p["stem1"], bs["stem1"], 3, 2, 4, 2, dtype=dtype)
    if cf2:
        # (V, H/2, W/4, 2*64) pack2 -> pack2 (s=1: pi=po=2). The packed
        # kernel is an exact centered 3x3 over 128 channels (tmin = -1),
        # so it lowers through the cf Pallas kernel: XLA ran this conv at
        # ~15% of peak (probe_trace maximum_convert_fusion, 2.6 ms at
        # bench shapes); the two cf layout converts cost ~0.1 ms each.
        k2, tmin, tmax = _wpack_kernel(p["stem2"]["Conv_0"]["kernel"],
                                       1, 2, 2)
        assert (tmin, tmax) == (-1, 1)
        sc, bi = _fold_bn(p["stem2"]["BatchNorm_0"],
                          bs["stem2"]["BatchNorm_0"])
        h2, w2 = x.shape[1], x.shape[2]
        x = from_cf(conv3x3_cf(to_cf(x.astype(dtype)), k2.astype(dtype),
                               h2, w2, scale=jnp.tile(sc, 2),
                               bias=jnp.tile(bi, 2), relu=True,
                               mstack=True),
                    h2, w2)
    else:
        x = _wpack_conv(x, p["stem2"], bs["stem2"], 3, 1, 2, 2,
                        dtype=dtype)
    # repack 2 -> 4 (free reshape), stem3 s2 -> pack2 of 128
    vb, hb, wb, cc = x.shape
    x = x.reshape(vb, hb, wb // 2, 2 * cc)
    x = _wpack_conv(x, p["stem3"], bs["stem3"], 3, 2, 4, 2, dtype=dtype)
    vb, hb, wb, cc = x.shape
    return x.reshape(vb, hb, wb * 2, cc // 2)        # unpack, free


def _ese_cf(x_flat, p, h, w):
    """eSE on cf (V, C, NL): GAP over the (zero-padded) spatial lanes,
    1x1 fc, hard-sigmoid, channel scale (scaling preserves zero pads)."""
    s = jnp.sum(x_flat.astype(jnp.float32), axis=2) / float(h * w)  # (V,C)
    k = p["fc"]["kernel"][0, 0].astype(jnp.float32)      # (C, C)
    b = p["fc"]["bias"].astype(jnp.float32)
    s = s @ k + b
    s = (jnp.clip(s + 3.0, 0.0, 6.0) / 6.0).astype(x_flat.dtype)
    return x_flat * s[:, :, None]


def _maxpool_cf(x_flat, h, w, rt=8):
    """3x3 stride-2 ceil-mode max pool: cf -> cf. Safe with zero pads:
    activations are >= 0 post-ReLU/eSE."""
    v, c, n = x_flat.shape
    wp = plan_wp(w)
    x = x_flat.reshape(v, c, n // wp, wp)[:, :, :h, :w]
    pad_h = (h - 3) % 2
    pad_w = (w - 3) % 2
    h2 = (h - 3 + pad_h) // 2 + 1
    w2 = (w - 3 + pad_w) // 2 + 1
    y = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (0, pad_h), (0, pad_w)])
    wp2 = plan_wp(w2)
    rows2 = plan_nl(h2, w2, rt) // wp2
    y = jnp.pad(y, ((0, 0), (0, 0), (0, rows2 - h2), (0, wp2 - w2)))
    return y.reshape(v, c, rows2 * wp2), h2, w2


def _osa_xla(x_nhwc, p, bs, identity, dtype):
    """One OSA block in plain NHWC XLA (stage-2 fast path: 128/256
    channels are exact 128-lane multiples, so XLA's conv pays no channel
    padding and its layout-fused convs beat the cf kernel's per-block
    overheads at 160x400 — composed A/B in runs/tpu_probe.log)."""
    outputs = [x_nhwc]
    y = x_nhwc
    for i in range(5):
        if f"conv{i}" not in p:
            break
        y = _convbn_xla(y, p[f"conv{i}"], bs[f"conv{i}"], 1, dtype=dtype)
        outputs.append(y)
    cat = jnp.concatenate(outputs, axis=-1)
    agg = _convbn_xla(cat, p["concat"], bs["concat"], 1, dtype=dtype)
    s = jnp.mean(agg.astype(jnp.float32), axis=(1, 2))
    s = s @ p["ese"]["fc"]["kernel"][0, 0].astype(jnp.float32) \
        + p["ese"]["fc"]["bias"].astype(jnp.float32)
    s = (jnp.clip(s + 3.0, 0.0, 6.0) / 6.0).astype(agg.dtype)
    out = agg * s[:, None, None, :]
    if identity:
        out = out + x_nhwc
    return out


def _osa_cf(x_cf, p, bs, identity, h, w, dtype, rt=8, mstack=True):
    """One OSA block, cf in -> cf out (same layout)."""
    layer_out = [x_cf]
    y = x_cf
    for i in range(5):
        if f"conv{i}" not in p:
            break
        cp = p[f"conv{i}"]
        scale, bias = _fold_bn(cp["BatchNorm_0"],
                               bs[f"conv{i}"]["BatchNorm_0"])
        y = conv3x3_cf(y, cp["Conv_0"]["kernel"].astype(dtype), h, w,
                       scale=scale, bias=bias, relu=True, rt=rt,
                       mstack=mstack)
        layer_out.append(y)
    # fused aggregate kernel: 1x1 conv over the (virtual) channel concat
    # + BN + ReLU + pad mask + eSE GAP sums in ONE pass over the parts
    # (sum-of-XLA-einsums materialized an f32 intermediate per part —
    # measured ~5 ms of pure HBM traffic per stage-2 block)
    aggk = p["concat"]["Conv_0"]["kernel"][0, 0]         # (sumC, Cout)
    scale, bias = _fold_bn(p["concat"]["BatchNorm_0"],
                           bs["concat"]["BatchNorm_0"])
    agg, gap = osa_agg_cf(layer_out, aggk, scale, bias, h, w, rt)
    # eSE from the GAP by-product: fc + hard-sigmoid + channel scale
    s = gap / float(h * w)
    s = s @ p["ese"]["fc"]["kernel"][0, 0].astype(jnp.float32) \
        + p["ese"]["fc"]["bias"].astype(jnp.float32)
    s = (jnp.clip(s + 3.0, 0.0, 6.0) / 6.0).astype(agg.dtype)
    out = agg * s[:, :, None]
    if identity:
        out = out + x_cf
    return out


def vovnet_cf(variables: Dict[str, Any], x_nhwc: jnp.ndarray,
              spec_name: str, out_features: Sequence[str],
              dtype=jnp.bfloat16, rt: int = 8,
              stop_after: str = None,
              stem_impl: str = "wpack",
              stage2_impl: str = "cf",
              mstack: bool = True) -> Dict[str, jnp.ndarray]:
    """Eval forward matching `VoVNet.__call__` (NHWC in/out).

    `stop_after` ("stem" / "stage2" .. "stage5") truncates the graph for
    cumulative probe timings (tools/probe_vovnet_cf.py); `stem_impl`
    selects the stem lowering: "wpack" (default — all three stem convs
    width-packed via free reshapes, kills the 3-channel input relayout
    copy + the lane-padded 3/64-ch convs: FULL 29.1 -> 28.0 ms and the
    4.1 ms in-model image relayout disappears, probe_trace), "xla"
    (direct convs), "xla_wpacked" (stem3 width-packed only), "cf2" (cf
    kernel for stem2)."""
    p = variables["params"]
    bs = variables["batch_stats"]
    spec = STAGE_SPECS[spec_name]
    # all-XLA stem. Composed-graph A/B (probe_vovnet_stems, n~50 each,
    # reps consistent to 0.1 ms): direct XLA stem 29.29 ms FULL vs 30.90
    # with the cf-kernel stem2 detour (to_cf+from_cf at 320x800) vs
    # 34.74 with a width-packed stem3 — both "clever" variants win
    # isolated but LOSE composed (XLA layout propagation), so the stem
    # stays on plain strided convs.
    if stem_impl.startswith("wpack"):
        # "wpack" = all-XLA packed convs; "wpack_cf2" routes stem2
        # through the cf kernel — isolated it wins, composed it LOSES
        # (30.0 vs 27.9 ms FULL, probe_vovnet_stems: the to_cf/from_cf
        # layout converts break XLA's layout propagation) — kept as a
        # measured alternative only.
        x = _stem_wpack(x_nhwc, p, bs, dtype=dtype,
                        cf2=stem_impl == "wpack_cf2")
        outputs = {}
        if "stem" in out_features:
            outputs["stem"] = x
        if stop_after == "stem":
            return {"_debug": x}
        return _stages_cf(x, p, bs, spec, out_features, outputs, dtype,
                          rt, stop_after, stage2_impl, mstack)
    x = _convbn_xla(x_nhwc, p["stem1"], bs["stem1"], 2, dtype=dtype)
    if stem_impl == "cf2":
        h2, w2 = x.shape[1], x.shape[2]
        sc2, bi2 = _fold_bn(p["stem2"]["BatchNorm_0"],
                            bs["stem2"]["BatchNorm_0"])
        x = conv3x3_cf(to_cf(x, rt),
                       p["stem2"]["Conv_0"]["kernel"].astype(dtype),
                       h2, w2, scale=sc2, bias=bi2, relu=True, rt=rt)
        x = from_cf(x, h2, w2)
    else:
        x = _convbn_xla(x, p["stem2"], bs["stem2"], 1, dtype=dtype)
    if stem_impl == "xla_wpacked":
        x = _convbn_s2_wpacked(x, p["stem3"], bs["stem3"], dtype=dtype)
    else:
        x = _convbn_xla(x, p["stem3"], bs["stem3"], 2, dtype=dtype)
    outputs = {}
    if "stem" in out_features:
        outputs["stem"] = x
    if stop_after == "stem":
        return {"_debug": x}

    return _stages_cf(x, p, bs, spec, out_features, outputs, dtype, rt,
                      stop_after, stage2_impl, mstack)


def _stages_cf(x, p, bs, spec, out_features, outputs, dtype, rt,
               stop_after, stage2_impl, mstack):
    """Stages 2-5 from a stem NHWC map (shared by all stem variants)."""
    v, h, w, _ = x.shape
    if stage2_impl == "xla":
        for b in range(spec["block_per_stage"][0]):
            x = _osa_xla(x, p[f"stage2_block{b}"], bs[f"stage2_block{b}"],
                         b > 0, dtype)
        if "stage2" in out_features:
            outputs["stage2"] = x
        flat = to_cf(x, rt)
        if stop_after == "stage2":
            return {"_debug": flat}
        start_stage = 1
    else:
        flat = to_cf(x, rt)
        start_stage = 0
    for i in range(start_stage, 4):
        name = f"stage{i + 2}"
        if i != 0:
            flat, h, w = _maxpool_cf(flat, h, w, rt)
        for b in range(spec["block_per_stage"][i]):
            flat = _osa_cf(flat, p[f"{name}_block{b}"],
                           bs[f"{name}_block{b}"], b > 0, h, w, dtype,
                           rt, mstack)
        if name in out_features:
            outputs[name] = from_cf(flat, h, w)
        if stop_after == name:
            return {"_debug": flat}
    return outputs
