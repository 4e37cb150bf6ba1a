"""Reference (PyTorch/mm*) checkpoint -> cmtcoop_tpu params converter.

The equivalent of tools/model_converters/convert_cmtcoop_checkpoints.py plus
the framework translation itself: maps mm-stack state_dict names/layouts to
our flax tree so reference-trained weights can be loaded for parity checks
and warm starts.

Layout rules:
  Conv2d   (O, I, kh, kw)          -> (kh, kw, I, O)
  Deconv   (I, O, kh, kw)          -> (kh, kw, I, O) + spatial flip
                                      (flax ConvTranspose correlates)
  Linear   (O, I)                  -> (I, O)
  BN       weight/bias/mean/var    -> scale/bias + batch_stats
  SubMConv3d / SparseConv3d (spconv 2.x: (O, kz, ky, kx, I))
                                   -> (K=kz*ky*kx, I, O)
  MultiheadAttention in_proj (3C, C) -> q/k/v (C, C) chunks
  grouped Conv1d (L*Cout, Cin, 1)  -> (L, Cin, Cout)
  GroupLayerNorm1d (L*C,)          -> (L, C)
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _conv(w):   # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def _deconv(w):
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose
    (kh, kw, I, O), spatially flipped: torch's transposed conv scatters the
    kernel non-flipped, while flax (transpose_kernel=False) correlates —
    verified against torch in tests/test_torch_parity.py."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def _linear(w):
    return np.transpose(w)


def _sparse(w):
    """spconv 2.x native (O, kz, ky, kx, I) -> (K, I, O)."""
    o = w.shape[0]
    i = w.shape[-1]
    return np.transpose(w, (1, 2, 3, 4, 0)).reshape(-1, i, o)


def _bn(sd, prefix):
    return (
        {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
        {"mean": sd[prefix + ".running_mean"],
         "var": sd[prefix + ".running_var"]},
    )


class Converter:
    """Accumulates params/batch_stats trees while consuming a state_dict."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: Dict = {}
        self.stats: Dict = {}
        self.used: set = set()

    def take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def set_param(self, path: List[str], value):
        node = self.params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def set_stat(self, path: List[str], value):
        node = self.stats
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    # ---------- building blocks ----------

    def conv_bn(self, tpref: str, jpath: List[str], deconv: bool = False):
        """torch ConvModule (conv+bn) -> our ConvBNReLU."""
        w = self.take(tpref + ".conv.weight")
        self.set_param(jpath + ["Conv_0", "kernel"],
                       _deconv(w) if deconv else _conv(w))
        bn_p, bn_s = _bn(self.sd, tpref + ".bn")
        for k in (tpref + ".bn.weight", tpref + ".bn.bias",
                  tpref + ".bn.running_mean", tpref + ".bn.running_var"):
            self.used.add(k)
        self.set_param(jpath + ["BatchNorm_0", "scale"], bn_p["scale"])
        self.set_param(jpath + ["BatchNorm_0", "bias"], bn_p["bias"])
        self.set_stat(jpath + ["BatchNorm_0", "mean"], bn_s["mean"])
        self.set_stat(jpath + ["BatchNorm_0", "var"], bn_s["var"])

    def raw_conv_bn(self, conv_key: str, bn_pref: str, jpath: List[str],
                    deconv: bool = False):
        w = self.take(conv_key)
        self.set_param(jpath + ["Conv_0", "kernel"],
                       _deconv(w) if deconv else _conv(w))
        for suffix, dest, setter in (
            ("weight", "scale", self.set_param),
            ("bias", "bias", self.set_param),
            ("running_mean", "mean", self.set_stat),
            ("running_var", "var", self.set_stat),
        ):
            setter(jpath + ["BatchNorm_0", dest],
                   self.take(f"{bn_pref}.{suffix}"))

    def mha(self, tpref: str, jpath: List[str]):
        w = self.take(tpref + ".attn.in_proj_weight")
        b = self.take(tpref + ".attn.in_proj_bias")
        c = w.shape[1]
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            self.set_param(jpath + [name, "kernel"],
                           _linear(w[i * c:(i + 1) * c]))
            self.set_param(jpath + [name, "bias"], b[i * c:(i + 1) * c])
        self.set_param(jpath + ["out_proj", "kernel"],
                       _linear(self.take(tpref + ".attn.out_proj.weight")))
        self.set_param(jpath + ["out_proj", "bias"],
                       self.take(tpref + ".attn.out_proj.bias"))

    def linear(self, tpref: str, jpath: List[str]):
        self.set_param(jpath + ["kernel"],
                       _linear(self.take(tpref + ".weight")))
        if tpref + ".bias" in self.sd:
            self.set_param(jpath + ["bias"], self.take(tpref + ".bias"))


def convert_vovnet(cv: Converter, tpref: str, jpath: List[str],
                   spec: Dict) -> None:
    """VoVNet: stem convs + OSA stages (vovnet.py naming scheme)."""
    for i in (1, 2, 3):
        cv.raw_conv_bn(f"{tpref}.stem.stem_{i}/conv.weight",
                       f"{tpref}.stem.stem_{i}/norm",
                       jpath + [f"stem{i}"])
    for si in range(4):
        stage = si + 2
        for b in range(spec["block_per_stage"][si]):
            tmod = f"{tpref}.stage{stage}.OSA{stage}_{b + 1}"
            jmod = jpath + [f"stage{stage}_block{b}"]
            for li in range(spec["layer_per_block"]):
                cv.raw_conv_bn(
                    f"{tmod}.layers.{li}.OSA{stage}_{b + 1}_{li}/"
                    f"conv.weight",
                    f"{tmod}.layers.{li}.OSA{stage}_{b + 1}_{li}/norm",
                    jmod + [f"conv{li}"])
            cv.raw_conv_bn(
                f"{tmod}.concat.OSA{stage}_{b + 1}_concat/conv.weight",
                f"{tmod}.concat.OSA{stage}_{b + 1}_concat/norm",
                jmod + ["concat"])
            cv.set_param(jmod + ["ese", "fc", "kernel"],
                         _conv(cv.take(f"{tmod}.ese.fc.weight")))
            cv.set_param(jmod + ["ese", "fc", "bias"],
                         cv.take(f"{tmod}.ese.fc.bias"))


_RESNET_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                  101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def convert_resnet(cv: Converter, tpref: str, jpath: List[str],
                   depth: int = 50) -> None:
    """mmdet/torchvision ResNet (conv1/bn1, layer{s}.{b}.conv{1..3}/bn{1..3},
    downsample.{0,1}) -> models/resnet.py naming (stem, layer{s}_{b})."""
    cv.raw_conv_bn(f"{tpref}.conv1.weight", f"{tpref}.bn1",
                   jpath + ["stem"])
    n_convs = 3 if depth >= 50 else 2
    for si, n_blocks in enumerate(_RESNET_BLOCKS[depth]):
        for b in range(n_blocks):
            tmod = f"{tpref}.layer{si + 1}.{b}"
            jmod = jpath + [f"layer{si + 1}_{b}"]
            for ci in range(1, n_convs + 1):
                cv.raw_conv_bn(f"{tmod}.conv{ci}.weight",
                               f"{tmod}.bn{ci}", jmod + [f"conv{ci}"])
            if f"{tmod}.downsample.0.weight" in cv.sd:
                cv.raw_conv_bn(f"{tmod}.downsample.0.weight",
                               f"{tmod}.downsample.1",
                               jmod + ["downsample"])


def convert_cpfpn(cv: Converter, tpref: str, jpath: List[str],
                  num_ins: int = 2) -> None:
    for i in range(num_ins):
        cv.set_param(jpath + [f"lateral{i}", "kernel"],
                     _conv(cv.take(f"{tpref}.lateral_convs.{i}.conv.weight")))
        cv.set_param(jpath + [f"lateral{i}", "bias"],
                     cv.take(f"{tpref}.lateral_convs.{i}.conv.bias"))
    cv.set_param(jpath + ["fpn0", "kernel"],
                 _conv(cv.take(f"{tpref}.fpn_convs.0.conv.weight")))
    cv.set_param(jpath + ["fpn0", "bias"],
                 cv.take(f"{tpref}.fpn_convs.0.conv.bias"))


def _sparse_block(cv: Converter, conv_key: str, bn_pref: str,
                  jpath: List[str]) -> None:
    cv.set_param(jpath + ["conv", "kernel"], _sparse(cv.take(conv_key)))
    for suffix, dest, setter in (
        ("weight", "scale", cv.set_param), ("bias", "bias", cv.set_param),
        ("running_mean", "mean", cv.set_stat),
        ("running_var", "var", cv.set_stat),
    ):
        setter(jpath + ["bn", dest], cv.take(f"{bn_pref}.{suffix}"))


def convert_sparse_encoder(cv: Converter, tpref: str, jpath: List[str],
                           encoder_channels) -> None:
    """mmdet3d SparseEncoder (basicblock) -> our gather/pillar encoders
    (identical trees)."""
    _sparse_block(cv, f"{tpref}.conv_input.0.weight",
                  f"{tpref}.conv_input.1", jpath + ["conv_input"])
    n_stages = len(encoder_channels)
    for i, blocks in enumerate(encoder_channels):
        layer = f"{tpref}.encoder_layers.encoder_layer{i + 1}"
        n_sbb = len(blocks) - (0 if i == n_stages - 1 else 1)
        for j in range(n_sbb):
            for cn, nn_ in (("conv1", "norm1"), ("conv2", "norm2")):
                dst = jpath + [f"stage{i}_block{j}"]
                cv.set_param(dst + [cn, "kernel"],
                             _sparse(cv.take(f"{layer}.{j}.{cn}.weight")))
                bnp = f"{layer}.{j}.{nn_}"
                bn_dst = "bn1" if cn == "conv1" else "bn2"
                for suffix, dest, setter in (
                    ("weight", "scale", cv.set_param),
                    ("bias", "bias", cv.set_param),
                    ("running_mean", "mean", cv.set_stat),
                    ("running_var", "var", cv.set_stat),
                ):
                    setter(dst + [bn_dst, dest],
                           cv.take(f"{bnp}.{suffix}"))
        if i != n_stages - 1:
            _sparse_block(cv, f"{layer}.{n_sbb}.0.weight",
                          f"{layer}.{n_sbb}.1",
                          jpath + [f"stage{i}_down"])
    _sparse_block(cv, f"{tpref}.conv_out.0.weight", f"{tpref}.conv_out.1",
                  jpath + ["conv_out"])


def convert_second(cv: Converter, tpref: str, jpath: List[str],
                   layer_nums=(5, 5)) -> None:
    for i, n in enumerate(layer_nums):
        seq = 0
        for j in range(n + 1):
            cv.raw_conv_bn(f"{tpref}.blocks.{i}.{seq}.weight",
                           f"{tpref}.blocks.{i}.{seq + 1}",
                           jpath + [f"block{i}_conv{j}"])
            seq += 3  # Conv, BN, ReLU


def convert_secondfpn(cv: Converter, tpref: str, jpath: List[str],
                      upsample_strides=(1, 2)) -> None:
    for i, s_ in enumerate(upsample_strides):
        w = cv.take(f"{tpref}.deblocks.{i}.0.weight")
        if s_ > 1:  # ConvTranspose2d (I, O, kh, kw)
            cv.set_param(jpath + [f"deblock{i}_up", "kernel"], _deconv(w))
        else:       # Conv2d
            cv.set_param(jpath + [f"deblock{i}_conv", "kernel"], _conv(w))
        for suffix, dest, setter in (
            ("weight", "scale", cv.set_param),
            ("bias", "bias", cv.set_param),
            ("running_mean", "mean", cv.set_stat),
            ("running_var", "var", cv.set_stat),
        ):
            setter(jpath + [f"deblock{i}_bn", dest],
                   cv.take(f"{tpref}.deblocks.{i}.1.{suffix}"))


def _grouped_conv1d(w, groups: int):
    """(groups*Cout, Cin, 1) -> (groups, Cin, Cout)."""
    gco, cin, _ = w.shape
    cout = gco // groups
    return w.reshape(groups, cout, cin)[..., :].transpose(0, 2, 1)


def convert_head(cv: Converter, tpref: str, jpath: List[str],
                 tasks, num_layers: int = 6) -> None:
    """CmtHead: shared conv, embeddings, task heads, PETR decoder."""
    if f"{tpref}.shared_conv.conv.weight" in cv.sd:
        cv.raw_conv_bn(f"{tpref}.shared_conv.conv.weight",
                       f"{tpref}.shared_conv.bn",
                       jpath + ["shared_conv"])
    cv.set_param(jpath + ["reference_points"],
                 cv.take(f"{tpref}.reference_points.weight"))
    for name in ("bev_embedding", "rv_embedding"):
        if f"{tpref}.{name}.0.weight" in cv.sd:
            cv.linear(f"{tpref}.{name}.0", jpath + [name, "Dense_0"])
            cv.linear(f"{tpref}.{name}.2", jpath + [name, "Dense_1"])
    head_names = ("center", "height", "dim", "rot", "vel", "cls_logits")
    for t in range(len(tasks)):
        for hn in head_names:
            base = f"{tpref}.task_heads.{t}.{hn}"
            dst = jpath + [f"task_heads_{t}"]
            cv.set_param(dst + [f"{hn}_fc0", "kernel"],
                         _grouped_conv1d(cv.take(f"{base}.0.weight"),
                                         num_layers))
            cv.set_param(dst + [f"{hn}_ln0", "scale"],
                         cv.take(f"{base}.1.weight").reshape(num_layers, -1))
            cv.set_param(dst + [f"{hn}_ln0", "bias"],
                         cv.take(f"{base}.1.bias").reshape(num_layers, -1))
            cv.set_param(dst + [f"{hn}_out", "kernel"],
                         _grouped_conv1d(cv.take(f"{base}.3.weight"),
                                         num_layers))
            cv.set_param(dst + [f"{hn}_out", "bias"],
                         cv.take(f"{base}.3.bias").reshape(num_layers, -1))
    for l in range(num_layers):
        lp = f"{tpref}.transformer.decoder.layers.{l}"
        dst = jpath + ["decoder", f"layer{l}"]
        cv.mha(f"{lp}.attentions.0", dst + ["self_attn"])
        # flash cross-attn: packed Wqkv
        wq = f"{lp}.attentions.1.attn.Wqkv.weight"
        if wq in cv.sd:
            w = cv.take(wq)
            b = cv.take(f"{lp}.attentions.1.attn.Wqkv.bias")
            c = w.shape[1]
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                cv.set_param(dst + ["cross_attn", name, "kernel"],
                             _linear(w[i * c:(i + 1) * c]))
                cv.set_param(dst + ["cross_attn", name, "bias"],
                             b[i * c:(i + 1) * c])
            cv.linear(f"{lp}.attentions.1.attn.out_proj",
                      dst + ["cross_attn", "out_proj"])
        else:
            cv.mha(f"{lp}.attentions.1", dst + ["cross_attn"])
        cv.linear(f"{lp}.ffns.0.layers.0.0", dst + ["ffn", "Dense_0"])
        cv.linear(f"{lp}.ffns.0.layers.1", dst + ["ffn", "Dense_1"])
        for ni in range(3):
            cv.set_param(dst + [f"norm{ni + 1}", "scale"],
                         cv.take(f"{lp}.norms.{ni}.weight"))
            cv.set_param(dst + [f"norm{ni + 1}", "bias"],
                         cv.take(f"{lp}.norms.{ni}.bias"))
    cv.set_param(jpath + ["decoder", "post_norm", "scale"],
                 cv.take(f"{tpref}.transformer.decoder.post_norm.weight"))
    cv.set_param(jpath + ["decoder", "post_norm", "bias"],
                 cv.take(f"{tpref}.transformer.decoder.post_norm.bias"))


DEFAULT_SPEC = dict(
    block_per_stage=(1, 3, 9, 3), layer_per_block=5,
    encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                      (128, 128)),
    second_layers=(5, 5), upsample_strides=(1, 2),
    num_decoder_layers=6,
    tasks=(("CAR",),),
)


def convert_state_dict(sd: Dict[str, np.ndarray],
                       spec: Dict = None) -> Tuple[Dict, Dict, List[str]]:
    """Best-effort conversion of a reference checkpoint's state_dict.

    Returns (params, batch_stats, unused_keys). Handles single-agent
    CmtDetector layouts and the coop vehicle_model./infrastructure_model.
    prefix scheme; the caller grafts subtrees as needed (see
    train.checkpoint.graft_single_agent_params).
    """
    spec = {**DEFAULT_SPEC, **(spec or {})}
    cv = Converter(sd)

    def convert_agent(tp: str, jp: List[str]):
        if any(k.startswith(f"{tp}img_backbone") for k in sd):
            if f"{tp}img_backbone.conv1.weight" in sd:  # ResNet layout
                convert_resnet(cv, f"{tp}img_backbone",
                               jp + ["img_backbone"],
                               spec.get("resnet_depth", 50))
            else:
                convert_vovnet(cv, f"{tp}img_backbone",
                               jp + ["img_backbone"], spec)
            convert_cpfpn(cv, f"{tp}img_neck", jp + ["img_neck"])
        if any(k.startswith(f"{tp}pts_middle_encoder") for k in sd):
            convert_sparse_encoder(cv, f"{tp}pts_middle_encoder",
                                   jp + ["pts_middle_encoder"],
                                   spec["encoder_channels"])
            convert_second(cv, f"{tp}pts_backbone", jp + ["pts_backbone"],
                           spec["second_layers"])
            convert_secondfpn(cv, f"{tp}pts_neck", jp + ["pts_neck"],
                              spec["upsample_strides"])

    if any(k.startswith("vehicle_model.") for k in sd):
        convert_agent("vehicle_model.", ["vehicle_model"])
        convert_agent("infrastructure_model.", ["infrastructure_model"])
    else:
        convert_agent("", ["extractor"])
    if any(k.startswith("pts_bbox_head.reference_points") for k in sd):
        convert_head(cv, "pts_bbox_head", ["pts_bbox_head"],
                     spec["tasks"], spec["num_decoder_layers"])
    unused = [k for k in sd if k not in cv.used]
    return cv.params, cv.stats, unused
