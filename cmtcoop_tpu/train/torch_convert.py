"""Reference (PyTorch/mm*) checkpoint -> cmtcoop_tpu params converter.

The equivalent of tools/model_converters/convert_cmtcoop_checkpoints.py plus
the framework translation itself: maps mm-stack state_dict names/layouts to
our flax tree so reference-trained weights can be loaded for parity checks
and warm starts.

Layout rules:
  Conv2d   (O, I, kh, kw)          -> (kh, kw, I, O)
  Deconv   (I, O, kh, kw)          -> (kh, kw, I, O)   (flax ConvTranspose)
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


def _deconv(w):  # (I, O, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 0, 1))


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


def convert_state_dict(sd: Dict[str, np.ndarray],
                       spec: Dict) -> Tuple[Dict, Dict, List[str]]:
    """Best-effort conversion of a reference checkpoint's state_dict.

    Returns (params, batch_stats, unused_keys). Only the components present
    in `sd` are converted; the caller grafts the subtrees it needs (e.g.
    into vehicle_model/infrastructure_model via
    train.checkpoint.graft_single_agent_params).
    """
    cv = Converter(sd)
    if any(k.startswith("img_backbone") for k in sd):
        convert_vovnet(cv, "img_backbone", ["img_backbone"], spec)
    unused = [k for k in sd if k not in cv.used]
    return cv.params, cv.stats, unused
