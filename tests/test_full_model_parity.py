"""FULL-MODEL forward parity vs a torch oracle (VERDICT r2 item 3).

Round 2 validated every converter layout rule module-by-module
(test_torch_parity.py). This test composes the COMPLETE single-agent
CmtDetector forward out of the same torch primitives — VoVNet + CPFPN +
sparse encoder (dense conv3d with occupancy masking) + SECOND + SECONDFPN +
the whole CmtHead (PE machinery, decoder, task heads) — builds one
reference-layout state_dict for it, runs `train.torch_convert` on that
state_dict, and asserts per-task output parity AND decoded-box parity
against our jax CmtDetector. This is the strongest obtainable proxy for the
BASELINE.json "bbox outputs bit-comparable to the PyTorch reference" north
star while no released checkpoint is mounted (reference being emulated:
models/detectors/cmt.py:27-252 + models/dense_heads/cmt_head.py
forward_single:475-547 + convert_cmtcoop_checkpoints.py:156-372 layouts).
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from cmtcoop_tpu.core.coder import decode_boxes  # noqa: E402
from cmtcoop_tpu.models.detector import CmtDetector  # noqa: E402
from cmtcoop_tpu.ops.voxelize import hard_simple_vfe, voxelize  # noqa: E402
from cmtcoop_tpu.train.torch_convert import convert_state_dict  # noqa: E402
from tests.test_torch_parity import (  # noqa: E402
    _rand_bn, _t, _torch_conv_bn, _torch_vovnet)
from cmtcoop_tpu.models.vovnet import STAGE_SPECS  # noqa: E402

# ------------------------------- tiny config --------------------------------

PC_RANGE = (-8.0, -8.0, -5.0, 8.0, 8.0, 5.0)
VOXEL = (1.0, 1.0, 1.25)
GRID = (16, 16, 8)          # (X, Y, Z) -> sparse_shape (9, 16, 16)
MAX_VOX = 64
ENC_CH = ((4, 8), (8,))     # stage0: 1 SBB + down;  stage1: 1 SBB
STAGE_CAPS = (256, 256)
SECOND_CH, SECOND_LAYERS = (8, 16), (1, 1)
FPN_CH = (16, 16)
IMG_SPEC = "V-19-slim-eSE"
NECK_OUT = 32
HID, HEADS, NLAYERS, NQ, DEPTH = 32, 4, 2, 12, 8
TASKS = (("CAR", "TRUCK"), ("PEDESTRIAN",))
V, IMG_H, IMG_W = 2, 32, 64
DS_SCALE = 2                # one stride-2 downsample in the 2-stage encoder


def _mk_sd(rng):
    """Reference-layout state_dict for the full tiny CmtDetector."""
    sd = {}

    def w(*shape, s=0.25):
        return (rng.normal(size=shape) * s).astype(np.float32)

    def bn(pref, c):
        for suf, val in zip(("weight", "bias", "running_mean",
                             "running_var"), _rand_bn(rng, c)):
            sd[f"{pref}.{suf}"] = val

    # ---- img_backbone (VoVNet V-19-slim naming) + img_neck (CPFPN) ----
    spec = STAGE_SPECS[IMG_SPEC]

    def add_cb(name, cin, cout, k=3):
        sd[f"{name}/conv.weight"] = (
            rng.normal(size=(cout, cin, k, k))
            * (1.5 / np.sqrt(cin * k * k))).astype(np.float32)
        bn(f"{name}/norm", cout)

    stem = spec["stem"]
    add_cb("img_backbone.stem.stem_1", 3, stem[0])
    add_cb("img_backbone.stem.stem_2", stem[0], stem[1])
    add_cb("img_backbone.stem.stem_3", stem[1], stem[2])
    cin = stem[2]
    for si in range(4):
        stage = si + 2
        sc, oc = spec["stage_conv_ch"][si], spec["stage_out_ch"][si]
        for b in range(spec["block_per_stage"][si]):
            tm = f"img_backbone.stage{stage}.OSA{stage}_{b + 1}"
            ci = cin
            for li in range(spec["layer_per_block"]):
                add_cb(f"{tm}.layers.{li}.OSA{stage}_{b + 1}_{li}", ci, sc)
                ci = sc
            add_cb(f"{tm}.concat.OSA{stage}_{b + 1}_concat",
                   cin + sc * spec["layer_per_block"], oc, k=1)
            sd[f"{tm}.ese.fc.weight"] = w(oc, oc, 1, 1, s=0.1)
            sd[f"{tm}.ese.fc.bias"] = w(oc, s=0.1)
            cin = oc
    fin = (spec["stage_out_ch"][2], spec["stage_out_ch"][3])
    for i, c in enumerate(fin):
        sd[f"img_neck.lateral_convs.{i}.conv.weight"] = w(
            NECK_OUT, c, 1, 1, s=0.1)
        sd[f"img_neck.lateral_convs.{i}.conv.bias"] = w(NECK_OUT, s=0.1)
    sd["img_neck.fpn_convs.0.conv.weight"] = w(NECK_OUT, NECK_OUT, 3, 3,
                                               s=0.1)
    sd["img_neck.fpn_convs.0.conv.bias"] = w(NECK_OUT, s=0.1)

    # ---- pts_middle_encoder (spconv layouts (O, kz, ky, kx, I)) ----
    mp = "pts_middle_encoder"
    sd[f"{mp}.conv_input.0.weight"] = w(4, 3, 3, 3, 5)
    bn(f"{mp}.conv_input.1", 4)
    # encoder_layer1: SBB(4) then down 4->8
    for cn, nn_ in (("conv1", "norm1"), ("conv2", "norm2")):
        sd[f"{mp}.encoder_layers.encoder_layer1.0.{cn}.weight"] = w(
            4, 3, 3, 3, 4)
        bn(f"{mp}.encoder_layers.encoder_layer1.0.{nn_}", 4)
    sd[f"{mp}.encoder_layers.encoder_layer1.1.0.weight"] = w(8, 3, 3, 3, 4)
    bn(f"{mp}.encoder_layers.encoder_layer1.1.1", 8)
    # encoder_layer2: SBB(8)
    for cn, nn_ in (("conv1", "norm1"), ("conv2", "norm2")):
        sd[f"{mp}.encoder_layers.encoder_layer2.0.{cn}.weight"] = w(
            8, 3, 3, 3, 8)
        bn(f"{mp}.encoder_layers.encoder_layer2.0.{nn_}", 8)
    sd[f"{mp}.conv_out.0.weight"] = w(8, 3, 1, 1, 8)
    bn(f"{mp}.conv_out.1", 8)

    # ---- pts_backbone (SECOND) + pts_neck (SECONDFPN) ----
    # BEV in-channels: C*D = 8 * 2 = 16
    ci = 16
    for i, ch in enumerate(SECOND_CH):
        seq = 0
        for j in range(SECOND_LAYERS[i] + 1):
            sd[f"pts_backbone.blocks.{i}.{seq}.weight"] = w(ch, ci, 3, 3)
            bn(f"pts_backbone.blocks.{i}.{seq + 1}", ch)
            seq += 3
            ci = ch
    sd["pts_neck.deblocks.0.0.weight"] = w(FPN_CH[0], SECOND_CH[0], 1, 1)
    bn("pts_neck.deblocks.0.1", FPN_CH[0])
    sd["pts_neck.deblocks.1.0.weight"] = w(SECOND_CH[1], FPN_CH[1], 2, 2)
    bn("pts_neck.deblocks.1.1", FPN_CH[1])

    # ---- pts_bbox_head ----
    hd = "pts_bbox_head"
    sd[f"{hd}.shared_conv.conv.weight"] = w(HID, sum(FPN_CH), 3, 3)
    bn(f"{hd}.shared_conv.bn", HID)
    sd[f"{hd}.reference_points.weight"] = rng.uniform(
        0.05, 0.95, (NQ, 3)).astype(np.float32)
    sd[f"{hd}.bev_embedding.0.weight"] = w(HID, 2 * HID)
    sd[f"{hd}.bev_embedding.0.bias"] = w(HID)
    sd[f"{hd}.bev_embedding.2.weight"] = w(HID, HID)
    sd[f"{hd}.bev_embedding.2.bias"] = w(HID)
    sd[f"{hd}.rv_embedding.0.weight"] = w(4 * HID, DEPTH * 3)
    sd[f"{hd}.rv_embedding.0.bias"] = w(4 * HID)
    sd[f"{hd}.rv_embedding.2.weight"] = w(HID, 4 * HID)
    sd[f"{hd}.rv_embedding.2.bias"] = w(HID)
    for t, names in enumerate(TASKS):
        for hn, od in (("center", 2), ("height", 1), ("dim", 3),
                       ("rot", 2), ("vel", 2), ("cls_logits", len(names))):
            base = f"{hd}.task_heads.{t}.{hn}"
            sd[f"{base}.0.weight"] = w(NLAYERS * 64, HID, 1)
            sd[f"{base}.1.weight"] = w(NLAYERS * 64, s=0.5) + 1.0
            sd[f"{base}.1.bias"] = w(NLAYERS * 64)
            sd[f"{base}.3.weight"] = w(NLAYERS * od, 64, 1)
            sd[f"{base}.3.bias"] = w(NLAYERS * od)
    for l in range(NLAYERS):
        lp = f"{hd}.transformer.decoder.layers.{l}"
        for ai in (0, 1):
            sd[f"{lp}.attentions.{ai}.attn.in_proj_weight"] = w(
                3 * HID, HID)
            sd[f"{lp}.attentions.{ai}.attn.in_proj_bias"] = w(3 * HID)
            sd[f"{lp}.attentions.{ai}.attn.out_proj.weight"] = w(HID, HID)
            sd[f"{lp}.attentions.{ai}.attn.out_proj.bias"] = w(HID)
        sd[f"{lp}.ffns.0.layers.0.0.weight"] = w(64, HID)
        sd[f"{lp}.ffns.0.layers.0.0.bias"] = w(64)
        sd[f"{lp}.ffns.0.layers.1.weight"] = w(HID, 64)
        sd[f"{lp}.ffns.0.layers.1.bias"] = w(HID)
        for ni in range(3):
            sd[f"{lp}.norms.{ni}.weight"] = w(HID, s=0.3) + 1.0
            sd[f"{lp}.norms.{ni}.bias"] = w(HID)
    sd[f"{hd}.transformer.decoder.post_norm.weight"] = w(HID, s=0.3) + 1.0
    sd[f"{hd}.transformer.decoder.post_norm.bias"] = w(HID)
    return sd


# ------------------------- torch oracle: lidar path -------------------------


def _conv3d_bn_relu_masked(x, occ, w_spconv, sd, bn_pref, stride, pad,
                           subm, relu=True):
    """SubMConv3d / SparseConv3d emulated densely: at active sites a dense
    conv equals the sparse conv (inactive inputs are exactly zero); eval BN
    + masking by the output active set reproduces spconv's
    active-sites-only semantics."""
    wt = _t(np.transpose(w_spconv, (0, 4, 1, 2, 3)))  # (O, I, kz, ky, kx)
    y = F.conv3d(x, wt, stride=stride, padding=pad)
    if subm:
        occ_out = occ
    else:
        ones = torch.ones((1, 1) + w_spconv.shape[1:4])
        occ_out = (F.conv3d(occ, ones, stride=stride, padding=pad)
                   > 1e-6).float()
    g, b, m, v = (_t(sd[f"{bn_pref}.{s}"]) for s in
                  ("weight", "bias", "running_mean", "running_var"))
    y = F.batch_norm(y, m, v, g, b, False, 0.0, 1e-3)
    if relu:
        y = F.relu(y)
    return y * occ_out, occ_out


def _torch_sparse_encoder(dense, occ, sd):
    """dense (1, 5, D, H, W), occ (1, 1, D, H, W) -> BEV (1, C*D', H', W')."""
    mp = "pts_middle_encoder"
    x, occ = _conv3d_bn_relu_masked(
        dense, occ, sd[f"{mp}.conv_input.0.weight"], sd,
        f"{mp}.conv_input.1", 1, 1, subm=True)

    def sbb(x, occ, pref):
        idn = x
        y, _ = _conv3d_bn_relu_masked(
            x, occ, sd[f"{pref}.conv1.weight"], sd, f"{pref}.norm1", 1, 1,
            subm=True)
        y, _ = _conv3d_bn_relu_masked(
            y, occ, sd[f"{pref}.conv2.weight"], sd, f"{pref}.norm2", 1, 1,
            subm=True, relu=False)
        return F.relu(y + idn) * occ

    x = sbb(x, occ, f"{mp}.encoder_layers.encoder_layer1.0")
    x, occ = _conv3d_bn_relu_masked(
        x, occ, sd[f"{mp}.encoder_layers.encoder_layer1.1.0.weight"], sd,
        f"{mp}.encoder_layers.encoder_layer1.1.1", 2, 1, subm=False)
    x = sbb(x, occ, f"{mp}.encoder_layers.encoder_layer2.0")
    x, occ = _conv3d_bn_relu_masked(
        x, occ, sd[f"{mp}.conv_out.0.weight"], sd, f"{mp}.conv_out.1",
        (2, 1, 1), 0, subm=False)
    n, c, d, h, w2 = x.shape     # .dense() C-major flatten (mmdet3d)
    return x.reshape(n, c * d, h, w2)


def _torch_second_fpn(x, sd):
    for i, ch in enumerate(SECOND_CH):
        seq = 0
        for j in range(SECOND_LAYERS[i] + 1):
            bnv = tuple(sd[f"pts_backbone.blocks.{i}.{seq + 1}.{s}"]
                        for s in ("weight", "bias", "running_mean",
                                  "running_var"))
            stride = (1 if i == 0 else 2) if j == 0 else 1
            x = _torch_conv_bn(x, sd[f"pts_backbone.blocks.{i}.{seq}"
                                     ".weight"], bnv, stride, 1, eps=1e-3)
            seq += 3
        if i == 0:
            out0 = x
    ups = []
    for i, src in enumerate((out0, x)):
        bnv = tuple(sd[f"pts_neck.deblocks.{i}.1.{s}"] for s in
                    ("weight", "bias", "running_mean", "running_var"))
        g, b, m, v = (_t(a) for a in bnv)
        if i == 0:
            y = F.conv2d(src, _t(sd["pts_neck.deblocks.0.0.weight"]))
        else:
            y = F.conv_transpose2d(
                src, _t(sd["pts_neck.deblocks.1.0.weight"]), stride=2)
        ups.append(F.relu(F.batch_norm(y, m, v, g, b, False, 0.0, 1e-3)))
    return torch.cat(ups, dim=1)


# -------------------------- torch oracle: head ------------------------------


def _torch_pos2embed(pos, npf):
    """pos (..., 2) -> (..., 2*npf); cmt_head.py:40-50 formula."""
    pos = pos * (2.0 * math.pi)
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = 2.0 * torch.div(dim_t, 2, rounding_mode="floor") / npf + 1.0

    def emb(p):
        v = p[..., None] / dim_t
        return torch.stack(
            [v[..., 0::2].sin(), v[..., 1::2].cos()], dim=-1
        ).reshape(*v.shape[:-1], -1)

    return torch.cat([emb(pos[..., 1]), emb(pos[..., 0])], dim=-1)


def _torch_mlp(x, sd, pref):
    x = F.linear(x, _t(sd[f"{pref}.0.weight"]), _t(sd[f"{pref}.0.bias"]))
    return F.linear(F.relu(x), _t(sd[f"{pref}.2.weight"]),
                    _t(sd[f"{pref}.2.bias"]))


def _torch_inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(0.0, 1.0)
    return x.clamp(min=eps).log() - (1.0 - x).clamp(min=eps).log()


def _torch_mha(q, k, v, sd, pref):
    wi, bi = _t(sd[f"{pref}.attn.in_proj_weight"]), _t(
        sd[f"{pref}.attn.in_proj_bias"])
    wo, bo = _t(sd[f"{pref}.attn.out_proj.weight"]), _t(
        sd[f"{pref}.attn.out_proj.bias"])
    return F.multi_head_attention_forward(
        q.transpose(0, 1), k.transpose(0, 1), v.transpose(0, 1), HID,
        HEADS, wi, bi, None, None, False, 0.0, wo, bo,
        training=False, need_weights=False)[0].transpose(0, 1)


def _torch_head(bev, img_feats, l2i, i2l, sd):
    """bev (1, Cin, H, W); img_feats (1, V, C, Hf, Wf). Replicates
    CmtHead.forward_single eval path (cmt_head.py:475-547)."""
    hd = "pts_bbox_head"
    lo = torch.tensor(PC_RANGE[:3])
    hi = torch.tensor(PC_RANGE[3:])

    # shared conv + BEV tokens
    bnv = tuple(sd[f"{hd}.shared_conv.bn.{s}"] for s in
                ("weight", "bias", "running_mean", "running_var"))
    x = _torch_conv_bn(bev, sd[f"{hd}.shared_conv.conv.weight"], bnv, 1, 1)
    hb, wb = x.shape[2], x.shape[3]
    bev_tokens = x.flatten(2).transpose(1, 2)  # (1, H*W, C)

    # BEV PE (coords_bev, cmt_head.py:324-337)
    ys, xs = GRID[1] // DS_SCALE, GRID[0] // DS_SCALE
    gx = (torch.arange(xs, dtype=torch.float32) + 0.5) / xs
    gy = (torch.arange(ys, dtype=torch.float32) + 0.5) / ys
    coords = torch.stack(
        [gx[None, :].expand(ys, xs), gy[:, None].expand(ys, xs)],
        dim=-1).reshape(-1, 2)
    bev_pos = _torch_mlp(_torch_pos2embed(coords, HID), sd,
                         f"{hd}.bev_embedding")[None]

    # RV PE (frustum, cmt_head.py:417-433)
    v, c, hf, wf = img_feats.shape[1:]
    ch = torch.arange(hf, dtype=torch.float32) * IMG_H / hf
    cw = torch.arange(wf, dtype=torch.float32) * IMG_W / wf
    cd = 1.0 + torch.arange(DEPTH, dtype=torch.float32) * (
        PC_RANGE[3] - 1.0) / DEPTH
    hh = ch[:, None, None].expand(hf, wf, DEPTH)
    ww = cw[None, :, None].expand(hf, wf, DEPTH)
    dd = cd[None, None, :].expand(hf, wf, DEPTH)
    frus = torch.stack([ww * dd, hh * dd, dd, torch.ones_like(dd)], -1)
    pts = torch.einsum("hwdo,bvco->bvhwdc", frus, i2l)
    pts01 = (pts[..., :3] - lo) / (hi - lo)
    rv_pos = _torch_mlp(pts01.reshape(1, v, hf, wf, DEPTH * 3), sd,
                        f"{hd}.rv_embedding")
    rv_pos = rv_pos.reshape(1, v * hf * wf, HID)
    rv_tokens = img_feats.permute(0, 1, 3, 4, 2).reshape(
        1, v * hf * wf, c)

    memory = torch.cat([bev_tokens, rv_tokens], dim=1)
    memory_pos = torch.cat([bev_pos, rv_pos], dim=1)

    # query embeds (cmt_head.py:439-473)
    ref = _t(sd[f"{hd}.reference_points.weight"])[None]
    ref01 = torch.sigmoid(_torch_inverse_sigmoid(ref))
    q_bev = _torch_mlp(_torch_pos2embed(ref01, HID), sd,
                       f"{hd}.bev_embedding")
    pts3 = ref01 * (hi - lo) + lo
    pts_h = torch.cat([pts3, torch.ones_like(pts3[..., :1])], dim=-1)
    proj = torch.einsum("bnd,bvcd->bvnc", pts_h, l2i)
    z = proj[..., 2:3]
    z_pos = z > 0.0
    denom = z + torch.where(z_pos, 1e-6, -1e-6)
    uvz = torch.cat([proj[..., :3] / denom, proj[..., 3:]], dim=-1)
    in_img = ((uvz[..., 0] >= 0) & (uvz[..., 0] < IMG_W) &
              (uvz[..., 1] >= 0) & (uvz[..., 1] < IMG_H) & z_pos[..., 0])
    ray = uvz[..., None, :] * cd[None, None, None, :, None]
    ray = torch.cat([ray[..., :3], torch.ones_like(ray[..., :1])], dim=-1)
    back = torch.einsum("bvndo,bvco->bvndc", ray, i2l)
    back01 = (back[..., :3] - lo) / (hi - lo)
    q_rv = _torch_mlp(back01.reshape(1, v, NQ, DEPTH * 3), sd,
                      f"{hd}.rv_embedding")
    q_rv = (q_rv * in_img[..., None].float()).sum(dim=1)
    query_pos = q_bev + q_rv

    # decoder (petr_transformer op order)
    query = torch.zeros_like(query_pos)
    inter = []
    for l in range(NLAYERS):
        lp = f"{hd}.transformer.decoder.layers.{l}"
        out = _torch_mha(query + query_pos, query + query_pos, query, sd,
                         f"{lp}.attentions.0")
        query = F.layer_norm(query + out, (HID,),
                             _t(sd[f"{lp}.norms.0.weight"]),
                             _t(sd[f"{lp}.norms.0.bias"]))
        out = _torch_mha(query + query_pos, memory + memory_pos, memory,
                         sd, f"{lp}.attentions.1")
        query = F.layer_norm(query + out, (HID,),
                             _t(sd[f"{lp}.norms.1.weight"]),
                             _t(sd[f"{lp}.norms.1.bias"]))
        y = F.linear(query, _t(sd[f"{lp}.ffns.0.layers.0.0.weight"]),
                     _t(sd[f"{lp}.ffns.0.layers.0.0.bias"]))
        y = F.linear(F.relu(y), _t(sd[f"{lp}.ffns.0.layers.1.weight"]),
                     _t(sd[f"{lp}.ffns.0.layers.1.bias"]))
        query = F.layer_norm(query + y, (HID,),
                             _t(sd[f"{lp}.norms.2.weight"]),
                             _t(sd[f"{lp}.norms.2.bias"]))
        inter.append(F.layer_norm(
            query, (HID,),
            _t(sd[f"{hd}.transformer.decoder.post_norm.weight"]),
            _t(sd[f"{hd}.transformer.decoder.post_norm.bias"])))
    outs_dec = torch.nan_to_num(torch.stack(inter, dim=0))  # (L, 1, NQ, C)

    # task heads (SeparateTaskHead grouped conv1d, cmt_head.py:97-203)
    reference = _torch_inverse_sigmoid(ref01)
    task_outs = []
    for t, names in enumerate(TASKS):
        x = outs_dec.permute(1, 0, 3, 2).reshape(1, NLAYERS * HID, NQ)
        outs = {}
        for hn, od in (("center", 2), ("height", 1), ("dim", 3),
                       ("rot", 2), ("vel", 2),
                       ("cls_logits", len(names))):
            base = f"{hd}.task_heads.{t}.{hn}"
            y = F.conv1d(x, _t(sd[f"{base}.0.weight"]), groups=NLAYERS)
            n, ch, qn = y.shape
            yg = y.view(n, NLAYERS, ch // NLAYERS, qn)
            mu = yg.mean(2, keepdim=True)
            var = (yg - mu).pow(2).mean(2, keepdim=True)
            y = ((yg - mu) / (var + 1e-6).sqrt()).view(n, ch, qn)
            y = (_t(sd[f"{base}.1.weight"]).view(1, ch, 1) * y
                 + _t(sd[f"{base}.1.bias"]).view(1, ch, 1))
            y = F.conv1d(F.relu(y), _t(sd[f"{base}.3.weight"]),
                         _t(sd[f"{base}.3.bias"]), groups=NLAYERS)
            outs[hn] = y.view(1, NLAYERS, od, qn).permute(1, 0, 3, 2)
        center = torch.sigmoid(outs["center"] + reference[None, ..., :2])
        height = torch.sigmoid(outs["height"] + reference[None, ..., 2:3])
        cx = center[..., 0:1] * (PC_RANGE[3] - PC_RANGE[0]) + PC_RANGE[0]
        cy = center[..., 1:2] * (PC_RANGE[4] - PC_RANGE[1]) + PC_RANGE[1]
        outs["center"] = torch.cat([cx, cy], dim=-1)
        outs["height"] = height * (PC_RANGE[5] - PC_RANGE[2]) + PC_RANGE[2]
        task_outs.append(outs)
    return task_outs


# --------------------------------- the test ---------------------------------


def test_full_model_forward_and_decode_parity(rng):
    sd = _mk_sd(rng)

    # synthetic batch: clustered cloud (~20 occupied voxels), 2 cameras
    centers = rng.uniform(-7, 7, (20, 3)) * [1, 1, 0.5]
    pts = np.repeat(centers, 2, axis=0) + rng.normal(0, 0.05, (40, 3))
    pts = np.clip(pts, -7.9, 7.9).astype(np.float32)
    pts5 = np.concatenate(
        [pts, rng.uniform(0, 1, (40, 1)).astype(np.float32),
         np.zeros((40, 1), np.float32)], axis=1)
    imgs = rng.normal(size=(1, V, IMG_H, IMG_W, 3)).astype(np.float32)
    # plausible lidar2img: K @ [R|t] with a small yaw per view
    l2i = np.zeros((1, V, 4, 4), np.float32)
    for vi in range(V):
        ang = 0.3 * vi
        rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                        [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        ext = np.eye(4, dtype=np.float32)
        # lidar x->cam z (forward), lidar -y->cam x, lidar -z->cam y
        ext[:3, :3] = np.array([[0, -1, 0], [0, 0, -1],
                                [1, 0, 0]]) @ rot.T
        ext[:3, 3] = (0.2, -0.1, 9.0)
        K = np.array([[20.0, 0, IMG_W / 2, 0], [0, 20.0, IMG_H / 2, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
        l2i[0, vi] = K @ ext
    i2l = np.linalg.inv(l2i).astype(np.float32)

    batch = {
        "points": jnp.asarray(pts5)[None],
        "points_mask": jnp.ones((1, 40), bool),
        "imgs": jnp.asarray(imgs),
        "lidar2img": jnp.asarray(l2i),
        "img2lidar": jnp.asarray(i2l),
    }

    # ---- jax side ----
    params, stats, unused = convert_state_dict(sd, spec=dict(
        encoder_channels=ENC_CH, second_layers=SECOND_LAYERS,
        upsample_strides=(1, 2), num_decoder_layers=NLAYERS, tasks=TASKS,
        block_per_stage=STAGE_SPECS[IMG_SPEC]["block_per_stage"],
        layer_per_block=STAGE_SPECS[IMG_SPEC]["layer_per_block"]))
    assert [k for k in unused if "num_batches" not in k] == [], unused[:8]

    model = CmtDetector(
        extractor_kwargs=dict(
            voxel_size=VOXEL, pc_range=PC_RANGE, grid_size=GRID,
            max_voxels=MAX_VOX, sparse_base_channels=4,
            sparse_channels=ENC_CH, sparse_out_channels=8,
            sparse_stage_caps=STAGE_CAPS, pillar_caps=STAGE_CAPS,
            second_channels=SECOND_CH, second_layers=SECOND_LAYERS,
            fpn_channels=FPN_CH, img_spec=IMG_SPEC,
            neck_out_channels=NECK_OUT, encoder_impl="gather"),
        head_kwargs=dict(
            num_query=NQ, hidden_dim=HID, in_channels=sum(FPN_CH),
            depth_num=DEPTH, max_gt=4, dn_groups=2,
            num_decoder_layers=NLAYERS, num_heads=HEADS,
            feedforward_channels=64, downsample_scale=DS_SCALE,
            tasks=TASKS, cross_impl="xla"))
    variables = {"params": params, "batch_stats": stats}
    (task_outs, _), _ = model.apply(variables, batch,
                                    mutable=["batch_stats"])

    # ---- torch side ----
    vox = voxelize(batch["points"][0], batch["points_mask"][0],
                   voxel_size=VOXEL, pc_range=PC_RANGE, grid_size=GRID,
                   max_points=10, max_voxels=MAX_VOX)
    feats = np.asarray(hard_simple_vfe(vox))
    coords = np.asarray(vox.coords)
    mask = np.asarray(vox.mask)
    D, H, W = GRID[2] + 1, GRID[1], GRID[0]
    dense = np.zeros((5, D, H, W), np.float32)
    occ = np.zeros((1, D, H, W), np.float32)
    dense[:, coords[mask, 0], coords[mask, 1], coords[mask, 2]] = (
        feats[mask].T)
    occ[0, coords[mask, 0], coords[mask, 1], coords[mask, 2]] = 1.0

    with torch.no_grad():
        bev = _torch_sparse_encoder(_t(dense)[None], _t(occ)[None], sd)
        bev = _torch_second_fpn(bev, sd)
        # image tower
        img_sd = {k[len("img_backbone."):]: v for k, v in sd.items()
                  if k.startswith("img_backbone.")}
        x = _t(imgs.reshape(V, IMG_H, IMG_W, 3).transpose(0, 3, 1, 2))
        touts = _torch_vovnet(x, img_sd, STAGE_SPECS[IMG_SPEC])
        lat = [F.conv2d(touts[f"stage{s}"],
                        _t(sd[f"img_neck.lateral_convs.{i}.conv.weight"]),
                        _t(sd[f"img_neck.lateral_convs.{i}.conv.bias"]))
               for i, s in enumerate((4, 5))]
        up = F.interpolate(lat[1], scale_factor=2, mode="nearest")
        l0 = lat[0] + up[:, :, :lat[0].shape[2], :lat[0].shape[3]]
        f0 = F.conv2d(l0, _t(sd["img_neck.fpn_convs.0.conv.weight"]),
                      _t(sd["img_neck.fpn_convs.0.conv.bias"]), padding=1)
        img_feats = f0[None]  # (1, V, C, Hf, Wf)
        torch_outs = _torch_head(bev, img_feats, _t(l2i), _t(i2l), sd)

    # ---- per-task output parity ----
    for t in range(len(TASKS)):
        for key in ("center", "height", "dim", "rot", "vel", "cls_logits"):
            np.testing.assert_allclose(
                np.asarray(task_outs[t][key], np.float32),
                torch_outs[t][key].numpy(), rtol=2e-3, atol=2e-3,
                err_msg=f"task{t}.{key}")

    # ---- decoded-box parity (MultiTaskBBoxCoder path) ----
    def decode(outs_list, to_np):
        logits = [to_np(t["cls_logits"])[-1, 0] for t in outs_list]
        codes = [np.concatenate(
            [to_np(t[k])[-1, 0] for k in
             ("center", "height", "dim", "rot", "vel")], axis=-1)
            for t in outs_list]
        return decode_boxes([jnp.asarray(l) for l in logits],
                            [jnp.asarray(c) for c in codes], max_num=12)

    dec_j = decode(task_outs, lambda x: np.asarray(x, np.float32))
    dec_t = decode(torch_outs, lambda x: x.numpy())
    np.testing.assert_array_equal(np.asarray(dec_j.labels),
                                  np.asarray(dec_t.labels))
    np.testing.assert_allclose(np.asarray(dec_j.scores),
                               np.asarray(dec_t.scores), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dec_j.boxes),
                               np.asarray(dec_t.boxes), atol=2e-3)
