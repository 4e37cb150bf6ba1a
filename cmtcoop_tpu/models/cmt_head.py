"""CMT detection head: queries, 3D-coordinate PEs, DN-DETR denoising, decoder,
separate task heads.

Rebuild of reference models/dense_heads/cmt_head.py (1086 LoC) +
models/utils/cmt_transformer.py (memory assembly, cmt_transformer.py:104-127)
with TPU-first static shapes:

- DN denoising (cmt_head.py:339-415) uses static caps: `max_gt` GT slots per
  sample and `dn_groups` noise groups -> pad = max_gt*dn_groups extra queries;
  the reference's data-dependent (max known_num, groups) pair becomes fixed
  mask algebra, with invalid slots carried by weights instead of gathers.
- the group-blocking DN attention mask (cmt_head.py:392-404) is a static
  additive bias.
- modality variants: `with_bev=False` -> CmtImageHead, `with_rv=False` ->
  CmtLidarHead (cmt_head.py:922-999, 1002-1086).

Head output dict per task (keys match the reference):
  center (L,B,nq,2 metric), height (L,B,nq,1 metric), dim/rot/vel,
  cls_logits, and dn_* counterparts when training with DN.
"""
from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cmtcoop_tpu.core.boxes import inverse_sigmoid, normalize_01
from cmtcoop_tpu.core.pos_embed import (bev_pos2embed_grid, depth_bins,
                                        frustum_coords, pos2embed)
from cmtcoop_tpu.models.layers import MLP, ConvBNReLU, conv_bn_relu_cf
from cmtcoop_tpu.models.petr_decoder import PETRTransformerDecoder
from cmtcoop_tpu.ops.attention import NEG_INF

COMMON_HEADS: Tuple[Tuple[str, int, int], ...] = (
    ("center", 2, 2), ("height", 1, 2), ("dim", 3, 2), ("rot", 2, 2),
    ("vel", 2, 2))  # (name, out_dim, num_conv), coop config:276


class AgentInputs(NamedTuple):
    """One agent's feature inputs to the head (vehicle or infrastructure —
    the coop head gets one per agent, cmt_head_coop.py:362-389)."""
    bev_feat: Optional[jnp.ndarray] = None   # (B, Hb, Wb, C_in)
    img_feats: Optional[jnp.ndarray] = None  # (B, V, Hf, Wf, C)
    lidar2img: Optional[jnp.ndarray] = None  # (B, V, 4, 4)
    img2lidar: Optional[jnp.ndarray] = None  # (B, V, 4, 4)
    pad_hw: Optional[Tuple[int, int]] = None


class DNInfo(NamedTuple):
    """Static-shape denoising metadata carried to the loss."""
    known_labels: jnp.ndarray   # (B, groups, G) global label after noise split
    known_labels_raw: jnp.ndarray  # (B, groups, G) global label, no split
    known_boxes: jnp.ndarray    # (B, groups, G, 9) gravity-centered gt box9
    valid: jnp.ndarray          # (B, groups, G) slot validity
    pad_size: int


class GroupedDense(nn.Module):
    """Per-decoder-layer grouped 1x1 Conv1d (SeparateTaskHead branches,
    cmt_head.py:134-160): weights (L, Cin, Cout), einsum over layer groups."""
    features: int
    use_bias: bool = True
    bias_init: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (L, B, Q, C)
        l, _, _, c = x.shape
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (l, c, self.features), jnp.float32)
        y = jnp.einsum("lbqc,lco->lbqo", x, w.astype(x.dtype))
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.constant(self.bias_init),
                (l, self.features), jnp.float32)
            y = y + b[:, None, None, :].astype(x.dtype)
        return y


class GroupLayerNorm(nn.Module):
    """Per-group LayerNorm over channels (GroupLayerNorm1d,
    cmt_head.py:53-94), eps 1e-6."""
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (L, B, Q, C)
        l, _, _, c = x.shape
        scale = self.param("scale", nn.initializers.ones, (l, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (l, c), jnp.float32)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        y = y * scale[:, None, None, :] + bias[:, None, None, :]
        return y.astype(x.dtype)


class SeparateTaskHead(nn.Module):
    """Grouped task head: one branch per output name, one weight group per
    decoder layer; cls bias init -2.19 (cmt_head.py:97-203)."""
    num_cls: int
    head_conv: int = 64
    init_bias: float = -2.19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, outs_dec) -> Dict[str, jnp.ndarray]:
        heads = COMMON_HEADS + (("cls_logits", self.num_cls, 2),)
        ret = {}
        for name, out_dim, num_conv in heads:
            x = outs_dec
            for i in range(num_conv - 1):
                x = GroupedDense(self.head_conv, use_bias=False,
                                 dtype=self.dtype, name=f"{name}_fc{i}")(x)
                x = GroupLayerNorm(dtype=self.dtype, name=f"{name}_ln{i}")(x)
                x = nn.relu(x)
            bias_init = self.init_bias if name == "cls_logits" else 0.0
            ret[name] = GroupedDense(
                out_dim, use_bias=True, bias_init=bias_init,
                dtype=self.dtype, name=f"{name}_out")(x)
        return ret


def dn_attn_bias(num_query: int, max_gt: int, groups: int) -> jnp.ndarray:
    """Static DN attention bias (tgt, tgt): matching queries cannot see DN
    slots; DN groups cannot see each other (cmt_head.py:392-404)."""
    pad = max_gt * groups
    tgt = pad + num_query
    gid = jnp.where(
        jnp.arange(tgt) < pad, jnp.arange(tgt) // max_gt, groups)
    dn_row = jnp.arange(tgt) < pad
    blocked_dn = dn_row[:, None] & dn_row[None, :] & (
        gid[:, None] != gid[None, :])
    blocked_match = (~dn_row[:, None]) & dn_row[None, :]
    blocked = blocked_dn | blocked_match
    return jnp.where(blocked, NEG_INF, 0.0).astype(jnp.float32)


class CmtHead(nn.Module):
    """Unified CmtHead / CmtLidarHead / CmtImageHead."""
    num_query: int = 900
    hidden_dim: int = 256
    in_channels: int = 512
    depth_num: int = 64
    downsample_scale: int = 8
    pc_range: Tuple[float, ...] = (-72.0, -72.0, -8.0, 72.0, 72.0, 0.0)
    grid_size: Tuple[int, int] = (1440, 1440)  # (X, Y)
    tasks: Tuple[Tuple[str, ...], ...] = (
        ("CAR", "TRAILER", "TRUCK", "VAN", "PEDESTRIAN", "BUS", "BICYCLE"),)
    with_bev: bool = True
    with_rv: bool = True
    # DN denoising (static caps)
    max_gt: int = 32
    dn_groups: int = 5
    noise_scale: float = 1.0
    noise_trans: float = 0.0
    split: float = 0.75
    # decoder
    num_decoder_layers: int = 6
    num_heads: int = 8
    feedforward_channels: int = 1024
    dropout: float = 0.1
    remat: bool = True
    train_mode: bool = False
    cross_impl: str = "auto"
    # cross_impl="kv_shard": shard the token memory over this mesh axis
    # (parallel/kv_shard.py), the multi-chip serving path
    kv_shard_mesh: Any = None
    kv_shard_axis: str = "mp"
    dtype: Any = jnp.float32

    @property
    def total_classes(self) -> int:
        return sum(len(t) for t in self.tasks)

    def class_offset(self, task_id: int) -> int:
        return sum(len(t) for t in self.tasks[:task_id])

    def setup(self):
        if self.with_bev:
            self.shared_conv = ConvBNReLU(
                self.hidden_dim, (3, 3), dtype=self.dtype)
        # shared by memory-PE and query-PE (reference reuses
        # self.bev_embedding / self.rv_embedding in both roles,
        # cmt_head.py:436-437, 433, 466)
        self.bev_embedding = MLP(self.hidden_dim, self.hidden_dim,
                                 self.dtype)
        if self.with_rv:
            self.rv_embedding = MLP(self.hidden_dim * 4, self.hidden_dim,
                                    self.dtype)
        self.reference_points = self.param(
            "reference_points", nn.initializers.uniform(scale=1.0),
            (self.num_query, 3), jnp.float32)
        self.decoder = PETRTransformerDecoder(
            self.num_decoder_layers, self.hidden_dim, self.num_heads,
            self.feedforward_channels, self.dropout, remat=self.remat,
            train_mode=self.train_mode, cross_impl=self.cross_impl,
            kv_shard_mesh=self.kv_shard_mesh,
            kv_shard_axis=self.kv_shard_axis, dtype=self.dtype)
        self.task_heads = [
            SeparateTaskHead(num_cls=len(names), dtype=self.dtype)
            for names in self.tasks
        ]

    # ---------------- PE helpers ----------------

    def _rv_pe(self, feat_hw, pad_hw, img2lidar):
        """Frustum-ray positional embedding for image tokens
        (cmt_head.py:417-433). img2lidar: (B, V, 4, 4)."""
        coords = frustum_coords(feat_hw, pad_hw, self.depth_num,
                                self.pc_range[3])  # (H, W, D, 4)
        pts = jnp.einsum("hwdo,bvco->bvhwdc", coords, img2lidar)
        pts01 = normalize_01(pts[..., :3], self.pc_range)
        flat = pts01.reshape(*pts01.shape[:-2], self.depth_num * 3)
        return self.rv_embedding(flat.astype(self.dtype))

    def _bev_query_embed(self, ref01):
        return self.bev_embedding(
            pos2embed(ref01, self.hidden_dim).astype(self.dtype))

    def _rv_query_embed(self, ref01, lidar2img, img2lidar, pad_hw):
        """Project queries into every view, mask invalid, back-project along
        depth bins, sum over views (cmt_head.py:439-467)."""
        pad_h, pad_w = pad_hw
        lo = jnp.asarray(self.pc_range[:3], jnp.float32)
        hi = jnp.asarray(self.pc_range[3:], jnp.float32)
        pts = ref01 * (hi - lo) + lo  # (B, N, 3)
        pts_h = jnp.concatenate(
            [pts, jnp.ones_like(pts[..., :1])], axis=-1)
        proj = jnp.einsum("bnd,bvcd->bvnc", pts_h, lidar2img)
        z = proj[..., 2:3]
        z_pos = z > 0.0
        denom = jax.lax.stop_gradient(z) + jnp.where(z_pos, 1e-6, -1e-6)
        uvz = proj.at[..., :3].set(proj[..., :3] / denom)
        in_img = (
            (uvz[..., 0] >= 0) & (uvz[..., 0] < pad_w) &
            (uvz[..., 1] >= 0) & (uvz[..., 1] < pad_h) & z_pos[..., 0])
        dbins = depth_bins(self.depth_num, self.pc_range[3])
        ray = uvz[..., None, :] * dbins[None, None, None, :, None]
        ray = jnp.concatenate(
            [ray[..., :3], jnp.ones_like(ray[..., :1])], axis=-1)
        back = jnp.einsum("bvndo,bvco->bvndc", ray, img2lidar)
        back01 = normalize_01(back[..., :3], self.pc_range)
        flat = back01.reshape(*back01.shape[:-2], self.depth_num * 3)
        emb = self.rv_embedding(flat.astype(self.dtype))
        return jnp.sum(emb * in_img[..., None].astype(emb.dtype), axis=1)

    # ---------------- DN ----------------

    def prepare_for_dn(self, key, ref_points, gt_boxes, gt_labels, gt_mask):
        """Noisy GT queries + static metadata (cmt_head.py:339-415).

        gt_boxes: (B, G, 9) gravity-centered; gt_labels: (B, G);
        gt_mask: (B, G). Returns (B, pad+nq, 3) reference points in [0,1],
        DNInfo.
        """
        b, g = gt_labels.shape
        groups = self.dn_groups
        rand = jax.random.uniform(
            key, (b, groups, g, 3), minval=-1.0, maxval=1.0)
        centers = gt_boxes[:, None, :, :3]
        diff = gt_boxes[:, None, :, 3:6] / 2.0 + self.noise_trans
        labels_rep = jnp.broadcast_to(gt_labels[:, None, :], (b, groups, g))
        if self.noise_scale > 0:
            # noise + the background split-flip both live inside the
            # `if bbox_noise_scale > 0` branch (cmt_head.py:364-377)
            noisy = centers + rand * diff * self.noise_scale
            n01 = jnp.clip(normalize_01(noisy, self.pc_range), 0.0, 1.0)
            over_split = jnp.linalg.norm(rand, axis=-1) > self.split
            known_labels = jnp.where(
                over_split, self.total_classes, labels_rep)
        else:
            n01 = jnp.clip(
                normalize_01(centers + 0 * rand, self.pc_range), 0.0, 1.0)
            known_labels = labels_rep
        boxes_rep = jnp.broadcast_to(
            gt_boxes[:, None, :, :], (b, groups, g, gt_boxes.shape[-1]))
        valid = jnp.broadcast_to(gt_mask[:, None, :], (b, groups, g))
        dn_ref = jnp.where(valid[..., None], n01, 0.0).reshape(b, -1, 3)
        padded_ref = jnp.concatenate(
            [dn_ref,
             jnp.broadcast_to(ref_points[None], (b,) + ref_points.shape)],
            axis=1)
        info = DNInfo(known_labels, labels_rep, boxes_rep, valid,
                      pad_size=groups * g)
        return padded_ref, info

    # ---------------- forward ----------------

    def __call__(
        self,
        agents: Sequence["AgentInputs"],
        gt_boxes: Optional[jnp.ndarray] = None,
        gt_labels: Optional[jnp.ndarray] = None,
        gt_mask: Optional[jnp.ndarray] = None,
    ):
        """Run the head over one or more agents and return (task_outs,
        dn_info).

        With a single agent this is CmtHead.forward_single
        (cmt_head.py:475-547). With several agents it is CmtHeadCoop
        (cmt_head_coop.py:341-389): shared reference points + DN state, one
        full decoder pass per agent on that agent's token memory, and
        element-wise max fusion of the per-layer decoder outputs.
        """
        first = agents[0]
        batch = (first.bev_feat if first.bev_feat is not None
                 else first.img_feats).shape[0]

        dn_info = None
        if self.train_mode and gt_boxes is not None:
            key = self.make_rng("dn")
            padded_ref, dn_info = self.prepare_for_dn(
                key, self.reference_points, gt_boxes, gt_labels, gt_mask)
        else:
            padded_ref = jnp.broadcast_to(
                self.reference_points[None],
                (batch,) + self.reference_points.shape)
        # query embedding: logit-clamped ref (cmt_head.py:471-473)
        ref01 = jax.nn.sigmoid(inverse_sigmoid(padded_ref))

        # one decoder pass per agent (shared weights, cmt_head_coop.py:
        # 341-360). NOTE: batching agents through one decoder call (pad
        # memories to the max token count + per-key bias) was measured
        # SLOWER (-9 ms at b1) — the vehicle memory padded to the infra
        # token count costs more than the dispatch it saves.
        outs_decs = []
        for agent in agents:
            memory, memory_pos = self.build_memory(agent, batch)
            query_pos = self._bev_query_embed(ref01)
            if self.with_rv:
                query_pos = query_pos + self._rv_query_embed(
                    ref01, agent.lidar2img, agent.img2lidar, agent.pad_hw)
            outs_decs.append(
                self.run_decoder(memory, memory_pos, query_pos, batch))

        if len(outs_decs) == 1:
            outs_dec = outs_decs[0]
        else:  # coop max fusion (cmt_head_coop.py:383-389)
            outs_dec = jnp.max(jnp.stack(outs_decs, axis=0), axis=0)
        return self.run_task_heads(outs_dec, padded_ref, dn_info), dn_info

    def build_memory(self, agent: "AgentInputs", batch: int):
        """Token memory + PEs for one agent; the CmtTransformer memory
        assembly (cmt_transformer.py:104-127) inlined. Memory token order is
        [BEV tokens (row-major y,x); RV tokens (view, h, w)] exactly as the
        reference concatenates them."""
        mem_parts, pos_parts = [], []

        if self.with_bev:
            use_cf = (not self.train_mode and not self.is_initializing()
                      and jax.default_backend() == "tpu")
            if use_cf:
                x = conv_bn_relu_cf(self.shared_conv.variables,
                                    agent.bev_feat, self.dtype)
            else:
                x = self.shared_conv(agent.bev_feat, self.train_mode)
            hb, wb = x.shape[1], x.shape[2]
            bev_tokens = x.reshape(batch, hb * wb, self.hidden_dim)
            # separable table: H+W sin/cos instead of H*W (pos_embed.py)
            bev_pos = self.bev_embedding(
                bev_pos2embed_grid(
                    (self.grid_size[1], self.grid_size[0]),
                    self.downsample_scale,
                    self.hidden_dim).astype(self.dtype))
            mem_parts.append(bev_tokens)
            pos_parts.append(jnp.broadcast_to(
                bev_pos[None], (batch,) + bev_pos.shape))

        if self.with_rv:
            bv, v, hf, wf, c = agent.img_feats.shape
            rv_tokens = agent.img_feats.reshape(batch, v * hf * wf, c)
            rv_pos = self._rv_pe((hf, wf), agent.pad_hw, agent.img2lidar)
            pos_parts.append(rv_pos.reshape(
                batch, v * hf * wf, self.hidden_dim))
            mem_parts.append(rv_tokens.astype(self.dtype))

        return (jnp.concatenate(mem_parts, axis=1),
                jnp.concatenate(pos_parts, axis=1))

    def run_decoder(self, memory, memory_pos, query_pos, batch,
                    memory_k_bias=None):
        nq = query_pos.shape[1]
        bias = None
        if self.train_mode and nq > self.num_query:
            # pad width follows the batch's actual GT slot count, which may
            # be smaller than max_gt
            single_pad = (nq - self.num_query) // self.dn_groups
            bias = dn_attn_bias(self.num_query, single_pad,
                                self.dn_groups)[None, None]
        target = jnp.zeros_like(query_pos)
        outs_dec = self.decoder(
            target, memory, query_pos, memory_pos, self_attn_bias=bias,
            memory_k_bias=memory_k_bias)
        return jnp.nan_to_num(outs_dec)

    def run_task_heads(self, outs_dec, padded_ref, dn_info):
        reference = inverse_sigmoid(padded_ref)  # (B, nq_t, 3)
        lo = self.pc_range
        task_outs = []
        for t, names in enumerate(self.tasks):
            outs = self.task_heads[t](outs_dec)
            center = jax.nn.sigmoid(
                outs["center"] + reference[None, :, :, :2])
            height = jax.nn.sigmoid(
                outs["height"] + reference[None, :, :, 2:3])
            cx = center[..., 0:1] * (lo[3] - lo[0]) + lo[0]
            cy = center[..., 1:2] * (lo[4] - lo[1]) + lo[1]
            outs["center"] = jnp.concatenate([cx, cy], axis=-1)
            outs["height"] = height * (lo[5] - lo[2]) + lo[2]
            if dn_info is not None and dn_info.pad_size > 0:
                pad = dn_info.pad_size
                for k in list(outs.keys()):
                    outs["dn_" + k] = outs[k][:, :, :pad]
                    outs[k] = outs[k][:, :, pad:]
            task_outs.append(outs)
        return task_outs
