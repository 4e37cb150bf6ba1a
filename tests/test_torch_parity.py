"""Bit-parity vs REAL torch modules (VERDICT r1 item 3).

Round-1's converter tests built synthetic state_dicts from the converter's
own layout assumptions (tree coverage, not layout truth). These tests close
that hole: every risky layout rule in `train.torch_convert` is exercised
against an actual torch CPU forward —

  - nn.MultiheadAttention in_proj packing (q/k/v chunk order)
  - Conv2d stride-2 torch padding vs the flax explicit-pad convention
  - ConvTranspose2d (I, O, kh, kw) kernel layout (SECONDFPN deblocks)
  - grouped Conv1d + GroupLayerNorm1d (SeparateTaskHead branches)
  - ResNet-50 (conv1 7x7 s2 p3 + maxpool p1 + bottleneck downsample)
  - VoVNet stem/OSA/eSE naming scheme + ceil-mode maxpool, with CPFPN
  - SECOND / SECONDFPN end to end
  - spconv-layout (O, kz, ky, kx, I) kernels vs a dense torch conv3d oracle
  - the full PETR decoder layer op order vs a hand-built torch layer

If any converter permutation or module convention were wrong, the outputs
here would diverge (reference: convert_cmtcoop_checkpoints.py:182-186,
petr_transformer.py:137-177, cmt_head.py:53-203).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from cmtcoop_tpu.models.layers import ConvBNReLU  # noqa: E402
from cmtcoop_tpu.models.petr_decoder import (  # noqa: E402
    MultiheadAttention, PETRDecoderLayer)
from cmtcoop_tpu.models.resnet import ResNet  # noqa: E402
from cmtcoop_tpu.models.second import SECOND, SECONDFPN  # noqa: E402
from cmtcoop_tpu.models.vovnet import CPFPN, VoVNet, STAGE_SPECS  # noqa
from cmtcoop_tpu.models.cmt_head import (  # noqa: E402
    GroupedDense, GroupLayerNorm)
from cmtcoop_tpu.models.sparse_encoder import SparseConv  # noqa: E402
from cmtcoop_tpu.ops import sparse_utils as su  # noqa: E402
from cmtcoop_tpu.train import torch_convert as tc  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _close(ours, theirs, rtol=1e-4, atol=1e-4):
    np.testing.assert_allclose(
        np.asarray(ours, np.float32),
        theirs.detach().numpy().astype(np.float32), rtol=rtol, atol=atol)


def _rand_bn(rng, c):
    """(weight, bias, running_mean, running_var) with non-trivial stats."""
    return (rng.normal(size=c).astype(np.float32),
            rng.normal(size=c).astype(np.float32),
            rng.normal(size=c).astype(np.float32),
            rng.uniform(0.5, 2.0, c).astype(np.float32))


def _torch_conv_bn(x, w, bn, stride=1, padding=0, relu=True, eps=1e-5):
    x = F.conv2d(x, _t(w), stride=stride, padding=padding)
    g, b, m, v = (_t(a) for a in bn)
    x = F.batch_norm(x, m, v, g, b, False, 0.0, eps)
    return F.relu(x) if relu else x


# ---------------------------------------------------------------- linear/MHA


def test_mha_in_proj_packing(rng):
    """nn.MultiheadAttention vs our MultiheadAttention via Converter.mha."""
    c, h, nq, nk = 32, 4, 7, 13
    mha = torch.nn.MultiheadAttention(c, h, batch_first=True)
    mha.eval()
    sd = {f"x.attn.{k}": v.detach().numpy()
          for k, v in mha.state_dict().items()}
    cv = tc.Converter(sd)
    cv.mha("x", ["mha"])

    q = rng.normal(size=(1, nq, c)).astype(np.float32)
    k = rng.normal(size=(1, nk, c)).astype(np.float32)
    v = rng.normal(size=(1, nk, c)).astype(np.float32)
    want, _ = mha(_t(q), _t(k), _t(v))
    got = MultiheadAttention(c, h, impl="xla").apply(
        {"params": cv.params["mha"]}, jnp.asarray(q), jnp.asarray(k),
        jnp.asarray(v))
    _close(got, want)


def test_mha_additive_mask(rng):
    """DN-style additive attn mask: torch attn_mask == our bias arg."""
    c, h, n = 32, 4, 9
    mha = torch.nn.MultiheadAttention(c, h, batch_first=True)
    mha.eval()
    sd = {f"x.attn.{k}": v.detach().numpy()
          for k, v in mha.state_dict().items()}
    cv = tc.Converter(sd)
    cv.mha("x", ["mha"])

    q = rng.normal(size=(1, n, c)).astype(np.float32)
    mask = np.where(rng.uniform(size=(n, n)) < 0.3, -1e9, 0.0).astype(
        np.float32)
    np.fill_diagonal(mask, 0.0)  # keep every row attendable
    want, _ = mha(_t(q), _t(q), _t(q), attn_mask=_t(mask))
    got = MultiheadAttention(c, h, impl="xla").apply(
        {"params": cv.params["mha"]}, jnp.asarray(q), jnp.asarray(q),
        jnp.asarray(q), bias=jnp.asarray(mask))
    _close(got, want)


# ------------------------------------------------------------------- conv2d


@pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (2, 7)])
def test_conv_bn_stride_padding(rng, stride, k):
    """torch Conv2d(pad=(k-1)//2) + eval BN vs ConvBNReLU — stride 2 is the
    case XLA 'SAME' gets wrong (pads (0,1) instead of torch's (1,1))."""
    cin, cout = 3, 8
    w = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.2
    bn = _rand_bn(rng, cout)
    x = rng.normal(size=(1, cin, 16, 16)).astype(np.float32)
    want = _torch_conv_bn(_t(x), w, bn, stride, (k - 1) // 2)

    sd = {"m.conv.weight": w, "m.bn.weight": bn[0], "m.bn.bias": bn[1],
          "m.bn.running_mean": bn[2], "m.bn.running_var": bn[3]}
    cv = tc.Converter(sd)
    cv.raw_conv_bn("m.conv.weight", "m.bn", ["m"])
    mod = ConvBNReLU(cout, (k, k), (stride, stride))
    got = mod.apply(
        {"params": cv.params["m"], "batch_stats": cv.stats["m"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    _close(got.transpose(0, 3, 1, 2), want)


def test_deconv_layout(rng):
    """ConvTranspose2d (I, O, kh, kw) vs flax ConvTranspose via _deconv."""
    cin, cout = 4, 6
    w = rng.normal(size=(cin, cout, 2, 2)).astype(np.float32)
    x = rng.normal(size=(1, cin, 8, 8)).astype(np.float32)
    want = F.conv_transpose2d(_t(x), _t(w), stride=2)

    import flax.linen as nn
    mod = nn.ConvTranspose(cout, (2, 2), (2, 2), padding="VALID",
                           use_bias=False)
    got = mod.apply({"params": {"kernel": tc._deconv(w)}},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    _close(got.transpose(0, 3, 1, 2), want)


# ----------------------------------------------------------------- backbones


def test_resnet50_parity(rng):
    """Hand-built torch ResNet-50 (torchvision/mmdet key scheme) vs ours."""

    class Bottleneck(torch.nn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(planes)
            self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1,
                                         bias=False)
            self.bn2 = torch.nn.BatchNorm2d(planes)
            self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(planes * 4)
            self.downsample = None
            if stride != 1 or cin != planes * 4:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(planes * 4))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return F.relu(out + idn)

    class R50(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(64)
            cin = 64
            for si, n in enumerate((3, 4, 6, 3)):
                planes = 64 * 2 ** si
                blocks = []
                for b in range(n):
                    s = (1 if si == 0 else 2) if b == 0 else 1
                    blocks.append(Bottleneck(cin, planes, s))
                    cin = planes * 4
                setattr(self, f"layer{si + 1}",
                        torch.nn.Sequential(*blocks))

        def forward(self, x):
            x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
            outs = []
            for si in range(4):
                x = getattr(self, f"layer{si + 1}")(x)
                outs.append(x)
            return outs

    tmodel = R50()
    # randomize BN stats so a running_mean/var swap would be caught
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    tmodel.eval()

    x = rng.normal(size=(1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        outs = tmodel(_t(x))

    sd = {f"bb.{k}": v.detach().numpy()
          for k, v in tmodel.state_dict().items()}
    cv = tc.Converter(sd)
    tc.convert_resnet(cv, "bb", ["bb"], depth=50)
    unused = [k for k in sd if k not in cv.used
              and "num_batches" not in k]
    assert unused == [], unused[:8]

    model = ResNet(50, ("layer3", "layer4"))
    got = model.apply(
        {"params": cv.params["bb"], "batch_stats": cv.stats["bb"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    _close(got["layer3"].transpose(0, 3, 1, 2), outs[2], 1e-3, 1e-3)
    _close(got["layer4"].transpose(0, 3, 1, 2), outs[3], 1e-3, 1e-3)


def _torch_vovnet(x, sd, spec, eps=1e-5):
    """Functional torch VoVNet with the mmdet key scheme convert_vovnet
    expects (reference models/backbones/vovnet.py naming)."""

    def cb(x, conv_key, bn_pref, stride=1):
        w = sd[conv_key]
        k = w.shape[-1]
        bn = (sd[f"{bn_pref}.weight"], sd[f"{bn_pref}.bias"],
              sd[f"{bn_pref}.running_mean"], sd[f"{bn_pref}.running_var"])
        return _torch_conv_bn(x, w, bn, stride, (k - 1) // 2, eps=eps)

    x = cb(x, "stem.stem_1/conv.weight", "stem.stem_1/norm", 2)
    x = cb(x, "stem.stem_2/conv.weight", "stem.stem_2/norm", 1)
    x = cb(x, "stem.stem_3/conv.weight", "stem.stem_3/norm", 2)
    outs = {}
    for si in range(4):
        stage = si + 2
        if si != 0:
            x = F.max_pool2d(x, 3, 2, ceil_mode=True)
        for b in range(spec["block_per_stage"][si]):
            tm = f"stage{stage}.OSA{stage}_{b + 1}"
            identity = x
            feats = [x]
            for li in range(spec["layer_per_block"]):
                x = cb(x, f"{tm}.layers.{li}.OSA{stage}_{b + 1}_{li}/"
                       "conv.weight",
                       f"{tm}.layers.{li}.OSA{stage}_{b + 1}_{li}/norm")
                feats.append(x)
            x = torch.cat(feats, dim=1)
            x = cb(x, f"{tm}.concat.OSA{stage}_{b + 1}_concat/conv.weight",
                   f"{tm}.concat.OSA{stage}_{b + 1}_concat/norm")
            s = x.mean((2, 3), keepdim=True)
            s = F.conv2d(s, _t(sd[f"{tm}.ese.fc.weight"]),
                         _t(sd[f"{tm}.ese.fc.bias"]))
            x = x * (F.relu6(s + 3.0) / 6.0)
            if b > 0:
                x = x + identity
        outs[f"stage{stage}"] = x
    return outs


def test_vovnet_cpfpn_parity(rng):
    """V-19-slim VoVNet + CPFPN vs functional torch with reference keys."""
    spec = STAGE_SPECS["V-19-slim-eSE"]
    sd = {}

    def add_cb(name, cin, cout, k=3):
        sd[f"{name}/conv.weight"] = (
            rng.normal(size=(cout, cin, k, k))
            * (1.5 / np.sqrt(cin * k * k))).astype(np.float32)
        for suf, val in zip(
            ("weight", "bias", "running_mean", "running_var"),
                _rand_bn(rng, cout)):
            sd[f"{name}/norm.{suf}"] = val

    stem = (64, 64, 128)
    add_cb("stem.stem_1", 3, stem[0])
    add_cb("stem.stem_2", stem[0], stem[1])
    add_cb("stem.stem_3", stem[1], stem[2])
    cin = stem[2]
    for si in range(4):
        stage = si + 2
        sc = spec["stage_conv_ch"][si]
        oc = spec["stage_out_ch"][si]
        for b in range(spec["block_per_stage"][si]):
            tm = f"stage{stage}.OSA{stage}_{b + 1}"
            ci = cin
            for li in range(spec["layer_per_block"]):
                add_cb(f"{tm}.layers.{li}.OSA{stage}_{b + 1}_{li}", ci, sc)
                ci = sc
            concat_in = cin + sc * spec["layer_per_block"]
            add_cb(f"{tm}.concat.OSA{stage}_{b + 1}_concat", concat_in, oc,
                   k=1)
            sd[f"{tm}.ese.fc.weight"] = rng.normal(
                size=(oc, oc, 1, 1)).astype(np.float32) * 0.1
            sd[f"{tm}.ese.fc.bias"] = rng.normal(size=(oc,)).astype(
                np.float32)
            cin = oc

    # CPFPN on (stage4, stage5)
    fin = (spec["stage_out_ch"][2], spec["stage_out_ch"][3])
    fout = 32
    for i, c in enumerate(fin):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = rng.normal(
            size=(fout, c, 1, 1)).astype(np.float32) * 0.1
        sd[f"neck.lateral_convs.{i}.conv.bias"] = rng.normal(
            size=(fout,)).astype(np.float32)
    sd["neck.fpn_convs.0.conv.weight"] = rng.normal(
        size=(fout, fout, 3, 3)).astype(np.float32) * 0.1
    sd["neck.fpn_convs.0.conv.bias"] = rng.normal(size=(fout,)).astype(
        np.float32)

    x = rng.normal(size=(1, 3, 64, 96)).astype(np.float32)
    touts = _torch_vovnet(_t(x), sd, spec)
    lat = [F.conv2d(touts[f"stage{s}"],
                    _t(sd[f"neck.lateral_convs.{i}.conv.weight"]),
                    _t(sd[f"neck.lateral_convs.{i}.conv.bias"]))
           for i, s in enumerate((4, 5))]
    up = F.interpolate(lat[1], scale_factor=2, mode="nearest")
    l0 = lat[0] + up[:, :, :lat[0].shape[2], :lat[0].shape[3]]
    want0 = F.conv2d(l0, _t(sd["neck.fpn_convs.0.conv.weight"]),
                     _t(sd["neck.fpn_convs.0.conv.bias"]), padding=1)

    sd_pref = {(k if k.startswith("neck.") else f"bb.{k}"): v
               for k, v in sd.items()}
    cv = tc.Converter(sd_pref)
    tc.convert_vovnet(cv, "bb", ["bb"], spec)
    tc.convert_cpfpn(cv, "neck", ["neck"])
    assert [k for k in sd_pref if k not in cv.used] == []

    bb = VoVNet("V-19-slim-eSE", ("stage4", "stage5"))
    feats = bb.apply(
        {"params": cv.params["bb"], "batch_stats": cv.stats["bb"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    _close(feats["stage4"].transpose(0, 3, 1, 2), touts["stage4"],
           1e-3, 1e-3)
    _close(feats["stage5"].transpose(0, 3, 1, 2), touts["stage5"],
           1e-3, 1e-3)
    neck = CPFPN(fout, num_outs=2)
    outs = neck.apply(
        {"params": cv.params["neck"]},
        [feats["stage4"], feats["stage5"]])
    _close(outs[0].transpose(0, 3, 1, 2), want0, 1e-3, 1e-3)
    _close(outs[1].transpose(0, 3, 1, 2), lat[1], 1e-3, 1e-3)


def test_second_fpn_parity(rng):
    """SECOND + SECONDFPN vs functional torch (incl. the stride-2 block1
    conv and the (I, O, kh, kw) deconv)."""
    sd = {}
    cin = 8
    chans = (8, 16)
    for i, ch in enumerate(chans):
        seq = 0
        ci = cin if i == 0 else chans[i - 1]
        for j in range(3):
            sd[f"bb.blocks.{i}.{seq}.weight"] = rng.normal(
                size=(ch, ci, 3, 3)).astype(np.float32) * 0.2
            for suf, val in zip(
                ("weight", "bias", "running_mean", "running_var"),
                    _rand_bn(rng, ch)):
                sd[f"bb.blocks.{i}.{seq + 1}.{suf}"] = val
            seq += 3
            ci = ch
    sd["neck.deblocks.0.0.weight"] = rng.normal(
        size=(8, 8, 1, 1)).astype(np.float32)
    sd["neck.deblocks.1.0.weight"] = rng.normal(
        size=(16, 8, 2, 2)).astype(np.float32)
    for i in range(2):
        for suf, val in zip(
            ("weight", "bias", "running_mean", "running_var"),
                _rand_bn(rng, 8)):
            sd[f"neck.deblocks.{i}.1.{suf}"] = val

    x = rng.normal(size=(1, cin, 16, 16)).astype(np.float32)
    tx = _t(x)
    touts = []
    for i, ch in enumerate(chans):
        seq = 0
        for j in range(3):
            bn = tuple(sd[f"bb.blocks.{i}.{seq + 1}.{suf}"] for suf in
                       ("weight", "bias", "running_mean", "running_var"))
            stride = (1 if i == 0 else 2) if j == 0 else 1
            tx = _torch_conv_bn(tx, sd[f"bb.blocks.{i}.{seq}.weight"], bn,
                                stride, 1, eps=1e-3)
            seq += 3
        touts.append(tx)
    ups = []
    for i in range(2):
        bn = tuple(sd[f"neck.deblocks.{i}.1.{suf}"] for suf in
                   ("weight", "bias", "running_mean", "running_var"))
        g, b_, m, v = (_t(a) for a in bn)
        if i == 0:
            y = F.conv2d(touts[0], _t(sd["neck.deblocks.0.0.weight"]))
        else:
            y = F.conv_transpose2d(
                touts[1], _t(sd["neck.deblocks.1.0.weight"]), stride=2)
        ups.append(F.relu(F.batch_norm(y, m, v, g, b_, False, 0.0, 1e-3)))
    want = torch.cat(ups, dim=1)

    cv = tc.Converter(sd)
    tc.convert_second(cv, "bb", ["bb"], layer_nums=(2, 2))
    tc.convert_secondfpn(cv, "neck", ["neck"])
    assert [k for k in sd if k not in cv.used] == []

    bb = SECOND(chans, (2, 2))
    outs = bb.apply(
        {"params": cv.params["bb"], "batch_stats": cv.stats["bb"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    neck = SECONDFPN((8, 8))
    got = neck.apply(
        {"params": cv.params["neck"], "batch_stats": cv.stats["neck"]},
        outs)
    _close(got.transpose(0, 3, 1, 2), want, 1e-3, 1e-3)


# ---------------------------------------------------------------- task head


def test_grouped_head_branch_parity(rng):
    """conv1d(groups=L) + GroupLayerNorm1d + relu + conv1d vs GroupedDense +
    GroupLayerNorm (reference SeparateTaskHead branch, cmt_head.py:134-160)."""
    L, C, H, O, Q = 3, 8, 16, 2, 5
    w0 = rng.normal(size=(L * H, C, 1)).astype(np.float32)
    g = rng.normal(size=(L * H,)).astype(np.float32)
    b = rng.normal(size=(L * H,)).astype(np.float32)
    w1 = rng.normal(size=(L * O, H, 1)).astype(np.float32)
    b1 = rng.normal(size=(L * O,)).astype(np.float32)
    x = rng.normal(size=(1, L * C, Q)).astype(np.float32)

    tx = F.conv1d(_t(x), _t(w0), groups=L)
    n, ch, q = tx.shape
    xg = tx.view(n, L, ch // L, q)
    mu = xg.mean(2, keepdim=True)
    var = (xg - mu).pow(2).mean(2, keepdim=True)
    y = ((xg - mu) / (var + 1e-6).sqrt()).view(n, ch, q)
    y = _t(g).view(1, ch, 1) * y + _t(b).view(1, ch, 1)
    want = F.conv1d(F.relu(y), _t(w1), _t(b1), groups=L)

    params0 = {"kernel": tc._grouped_conv1d(w0, L)}
    ln = {"scale": g.reshape(L, H), "bias": b.reshape(L, H)}
    params1 = {"kernel": tc._grouped_conv1d(w1, L),
               "bias": b1.reshape(L, O)}
    # our layout: (L, B, Q, C)
    xj = jnp.asarray(x.reshape(1, L, C, Q).transpose(1, 0, 3, 2))
    h1 = GroupedDense(H, use_bias=False).apply({"params": params0}, xj)
    h1 = GroupLayerNorm().apply({"params": ln}, h1)
    got = GroupedDense(O).apply({"params": params1}, jax.nn.relu(h1))
    want_j = want.detach().numpy().reshape(1, L, O, Q).transpose(1, 0, 3, 2)
    np.testing.assert_allclose(np.asarray(got), want_j, rtol=1e-4, atol=1e-4)


# -------------------------------------------------------------- sparse conv


def test_spconv_layout_vs_dense_conv3d(rng):
    """(O, kz, ky, kx, I) spconv-2.x kernels: _sparse() + gather_conv must
    equal torch conv3d with the correspondingly permuted dense weight.

    This pins the converter's layout rule to dense-conv ground truth: a
    wrong axis order in `_sparse` (e.g. x-major tap order or swapped I/O)
    breaks the equality."""
    shape = (4, 6, 6)
    cap = 32
    cin, cout = 3, 5
    d, h, w = shape
    lin = np.sort(rng.choice(d * h * w, size=20, replace=False))
    coords = np.stack([lin // (h * w), (lin // w) % h, lin % w],
                      -1).astype(np.int32)
    coords = np.concatenate([coords, -np.ones((cap - 20, 3), np.int32)])
    mask = np.zeros(cap, bool)
    mask[:20] = True
    feats = rng.normal(size=(cap, cin)).astype(np.float32)
    feats[~mask] = 0

    w_spconv = rng.normal(size=(cout, 3, 3, 3, cin)).astype(np.float32)

    # dense oracle: torch conv3d weight is (O, I, kz, ky, kx)
    dense = np.zeros(shape + (cin,), np.float32)
    dense[coords[mask, 0], coords[mask, 1], coords[mask, 2]] = feats[mask]
    tin = _t(dense.transpose(3, 0, 1, 2)[None])  # (1, C, D, H, W)
    tw = _t(w_spconv.transpose(0, 4, 1, 2, 3))
    want = F.conv3d(tin, tw, padding=1)[0].numpy()  # (O, D, H, W)

    kj = jnp.asarray(tc._sparse(w_spconv))  # (27, I, O)
    grid = su.SparseGrid(jnp.asarray(coords), jnp.asarray(mask), shape)
    nbr = su.subm_neighbor_map(grid)
    got = np.asarray(SparseConv(cout, 27).apply(
        {"params": {"kernel": np.asarray(kj)}}, jnp.asarray(feats)[None],
        np.asarray(nbr)[None]))[0]
    for i in range(cap):
        if mask[i]:
            z, y, x = coords[i]
            np.testing.assert_allclose(
                got[i], want[:, z, y, x], rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------- decoder layer


def test_petr_decoder_layer_parity(rng):
    """Full decoder layer vs a hand-built torch layer with the reference op
    order ('self_attn','norm','cross_attn','norm','ffn','norm'), PE added
    to q/k but not v, identity residual before PE
    (petr_transformer.py:137-177, 374-487)."""
    c, h, nq, nk, ffc = 32, 4, 6, 11, 64
    self_attn = torch.nn.MultiheadAttention(c, h, batch_first=True)
    cross_attn = torch.nn.MultiheadAttention(c, h, batch_first=True)
    lin1 = torch.nn.Linear(c, ffc)
    lin2 = torch.nn.Linear(ffc, c)
    norms = [torch.nn.LayerNorm(c) for _ in range(3)]
    for m in (self_attn, cross_attn, lin1, lin2, *norms):
        m.eval()
        for p in m.parameters():
            p.data.normal_(0, 0.3)

    q = rng.normal(size=(1, nq, c)).astype(np.float32)
    qpos = rng.normal(size=(1, nq, c)).astype(np.float32)
    mem = rng.normal(size=(1, nk, c)).astype(np.float32)
    mpos = rng.normal(size=(1, nk, c)).astype(np.float32)
    dn_mask = np.where(rng.uniform(size=(nq, nq)) < 0.3, -1e9, 0.0).astype(
        np.float32)
    np.fill_diagonal(dn_mask, 0.0)

    with torch.no_grad():
        tq, tqp, tm, tmp = _t(q), _t(qpos), _t(mem), _t(mpos)
        out, _ = self_attn(tq + tqp, tq + tqp, tq, attn_mask=_t(dn_mask))
        x = norms[0](tq + out)
        out, _ = cross_attn(x + tqp, tm + tmp, tm)
        x = norms[1](x + out)
        x = norms[2](x + lin2(F.relu(lin1(x))))
        want = x

    sd = {}
    for name, mod in (("attentions.0", self_attn),
                      ("attentions.1", cross_attn)):
        for k, v in mod.state_dict().items():
            sd[f"L.{name}.attn.{k}"] = v.detach().numpy()
    for k, v in lin1.state_dict().items():
        sd[f"L.ffns.0.layers.0.0.{k}"] = v.detach().numpy()
    for k, v in lin2.state_dict().items():
        sd[f"L.ffns.0.layers.1.{k}"] = v.detach().numpy()
    for i, nm in enumerate(norms):
        for k, v in nm.state_dict().items():
            sd[f"L.norms.{i}.{k}"] = v.detach().numpy()

    cv = tc.Converter(sd)
    cv.mha("L.attentions.0", ["self_attn"])
    cv.mha("L.attentions.1", ["cross_attn"])
    cv.linear("L.ffns.0.layers.0.0", ["ffn", "Dense_0"])
    cv.linear("L.ffns.0.layers.1", ["ffn", "Dense_1"])
    for ni in range(3):
        cv.set_param([f"norm{ni + 1}", "scale"],
                     cv.take(f"L.norms.{ni}.weight"))
        cv.set_param([f"norm{ni + 1}", "bias"],
                     cv.take(f"L.norms.{ni}.bias"))
    assert [k for k in sd if k not in cv.used] == []

    layer = PETRDecoderLayer(c, h, ffc, dropout=0.0, cross_impl="xla")
    got = layer.apply(
        {"params": cv.params}, jnp.asarray(q), jnp.asarray(mem),
        jnp.asarray(qpos), jnp.asarray(mpos), jnp.asarray(dn_mask), None)
    _close(got, want, 1e-4, 1e-4)
