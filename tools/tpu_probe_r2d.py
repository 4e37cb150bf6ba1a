#!/usr/bin/env python
"""Round-2 probe D: camera path + CMT head breakdown at bench shapes.

Loop-amortized like probe C. Times VoVNet, CPFPN, grid-independent head
pieces (shared_conv, BEV PE, RV PE, RV query embed), one decoder layer's
self/cross attention, and the full head single- vs two-agent.
Appends to runs/tpu_probe_r2.log.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.tpu_probe_r2 import log  # noqa: E402
from tools.tpu_probe_r2c import loop_time  # noqa: E402


def main():
    from cmtcoop_tpu.models.vovnet import CPFPN, VoVNet
    from cmtcoop_tpu.models.cmt_head import AgentInputs, CmtHead

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    log("[D] ==== probe D start ====")

    # ---- VoVNet-99 on 4 images (both agents' views together) ----
    imgs = jnp.asarray(rng.normal(size=(4, 640, 1600, 3))
                       .astype(np.float32)).astype(dtype)
    bb = VoVNet("V-99-eSE", ("stage4", "stage5"), dtype=dtype)
    bv = jax.jit(lambda k, x: bb.init(k, x, False))(
        jax.random.PRNGKey(0), imgs)

    def bb_fn(c, vs, x):
        outs = bb.apply(vs, x + c.astype(dtype) * 0, False)
        return outs["stage5"].astype(jnp.float32).sum() * 1e-20
    loop_time(bb_fn, bv, imgs, name="VoVNet99 4x640x1600", n=10)

    feats = bb.apply(bv, imgs, False)
    neck = CPFPN(256, num_outs=2, dtype=dtype)
    nv = jax.jit(lambda k, f: neck.init(k, f, False))(
        jax.random.PRNGKey(0), [feats["stage4"], feats["stage5"]])

    def neck_fn(c, vs, f):
        f = [x + c.astype(dtype) * 0 for x in f]
        outs = neck.apply(vs, f, False)
        return outs[0].astype(jnp.float32).sum() * 1e-20
    loop_time(neck_fn, nv, [feats["stage4"], feats["stage5"]],
              name="CPFPN", n=10)

    # ---- head at fusion shapes ----
    b = 1
    head = CmtHead(train_mode=False, dtype=dtype)
    bev_feat = jnp.asarray(rng.normal(size=(b, 180, 180, 512))
                           .astype(np.float32)).astype(dtype)
    l2i = np.tile(np.eye(4, dtype=np.float32), (b, 4, 1, 1))
    l2i[..., :3, 3] = rng.normal(size=(b, 4, 3))
    img_feats = jnp.asarray(rng.normal(size=(b, 4, 40, 100, 256))
                            .astype(np.float32)).astype(dtype)
    agent = AgentInputs(bev_feat, img_feats, jnp.asarray(l2i),
                        jnp.asarray(np.linalg.inv(l2i)), (640, 1600))
    hv = jax.jit(lambda k: head.init(
        {"params": k}, [agent]))(jax.random.PRNGKey(0))

    def head1_fn(c, vs, ag):
        ag = AgentInputs(ag.bev_feat + c.astype(dtype) * 0, ag.img_feats,
                         ag.lidar2img, ag.img2lidar, ag.pad_hw)
        outs, _ = head.apply(vs, [ag])
        return outs[0]["center"].astype(jnp.float32).sum() * 1e-20
    loop_time(head1_fn, hv, agent, name="head 1-agent fusion", n=5)

    def head2_fn(c, vs, ag):
        ag = AgentInputs(ag.bev_feat + c.astype(dtype) * 0, ag.img_feats,
                         ag.lidar2img, ag.img2lidar, ag.pad_hw)
        outs, _ = head.apply(vs, [ag, ag])
        return outs[0]["center"].astype(jnp.float32).sum() * 1e-20
    loop_time(head2_fn, hv, agent, name="head 2-agent fusion", n=5)

    # ---- head internals ----
    params = hv

    def bind(fn):
        def wrapped(c, *a):
            return head.apply(params, *a, method=fn, carry=c)
        return wrapped

    def mem_fn(c, ag):
        ag = AgentInputs(ag.bev_feat + c.astype(dtype) * 0, ag.img_feats,
                         ag.lidar2img, ag.img2lidar, ag.pad_hw)
        mem, pos = head.apply(params, ag, 1, method=CmtHead.build_memory)
        return mem.astype(jnp.float32).sum() * 1e-20 + \
            pos.astype(jnp.float32).sum() * 1e-20
    loop_time(mem_fn, agent, name="head build_memory (BEV+RV PE)", n=5)

    ref01 = jax.nn.sigmoid(jnp.asarray(
        rng.normal(size=(b, 900, 3)).astype(np.float32)))

    def qemb_fn(c, r, ag):
        r = r + c * 0
        q = head.apply(params, r, method=CmtHead._bev_query_embed)
        q = q + head.apply(params, r, ag.lidar2img, ag.img2lidar,
                           ag.pad_hw, method=CmtHead._rv_query_embed)
        return q.astype(jnp.float32).sum() * 1e-20
    loop_time(qemb_fn, ref01, agent, name="head query embeds", n=5)

    mem, mpos = head.apply(params, agent, 1, method=CmtHead.build_memory)
    qpos = jnp.asarray(rng.normal(size=(b, 900, 256))
                       .astype(np.float32)).astype(dtype)

    def dec_fn(c, m, mp, qp):
        m = m + c.astype(dtype) * 0
        out = head.apply(params, m, mp, qp, 1,
                         method=CmtHead.run_decoder)
        return out.astype(jnp.float32).sum() * 1e-20
    loop_time(dec_fn, mem, mpos, qpos, name="head decoder 6L x 44.4k kv",
              n=5)

    outs_dec = jnp.asarray(rng.normal(size=(6, b, 900, 256))
                           .astype(np.float32)).astype(dtype)
    padded_ref = jnp.asarray(rng.uniform(size=(b, 900, 3))
                             .astype(np.float32))

    def th_fn(c, od, pr):
        od = od + c.astype(dtype) * 0
        outs = head.apply(params, od, pr, None,
                          method=CmtHead.run_task_heads)
        return outs[0]["center"].astype(jnp.float32).sum() * 1e-20
    loop_time(th_fn, outs_dec, padded_ref, name="task heads", n=10)


if __name__ == "__main__":
    main()
