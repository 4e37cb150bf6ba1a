#!/usr/bin/env python
"""Probe E: sequential per-agent decoder vs agent-batched decoder, with
DISTINCT inputs per agent (identical inputs CSE into one pass and lie).
Also re-times build_memory after the separable BEV PE."""
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
    from cmtcoop_tpu.models.cmt_head import AgentInputs, CmtHead
    from cmtcoop_tpu.ops.attention import NEG_INF

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    log("[E] ==== probe E start ====")

    head = CmtHead(train_mode=False, dtype=dtype)
    b = 1
    bev_feat = jnp.asarray(rng.normal(size=(b, 180, 180, 512))
                           .astype(np.float32)).astype(dtype)
    l2i = np.tile(np.eye(4, dtype=np.float32), (b, 4, 1, 1))
    l2i[..., :3, 3] = rng.normal(size=(b, 4, 3))
    img_feats = jnp.asarray(rng.normal(size=(b, 4, 40, 100, 256))
                            .astype(np.float32)).astype(dtype)
    agent = AgentInputs(bev_feat, img_feats, jnp.asarray(l2i),
                        jnp.asarray(np.linalg.inv(l2i)), (640, 1600))
    params = jax.jit(lambda k: head.init(
        {"params": k}, [agent]))(jax.random.PRNGKey(0))

    def mem_fn(c, ag):
        ag = AgentInputs(ag.bev_feat + c.astype(dtype) * 0, ag.img_feats,
                         ag.lidar2img, ag.img2lidar, ag.pad_hw)
        mem, pos = head.apply(params, ag, 1, method=CmtHead.build_memory)
        return mem.astype(jnp.float32).sum() * 1e-20 + \
            pos.astype(jnp.float32).sum() * 1e-20
    loop_time(mem_fn, agent, name="[E] build_memory separable PE", n=5)

    # distinct memories per agent: veh 36.4k tokens, infra 44.4k
    m_veh = jnp.asarray(rng.normal(size=(1, 36400, 256))
                        .astype(np.float32)).astype(dtype)
    p_veh = jnp.asarray(rng.normal(size=(1, 36400, 256))
                        .astype(np.float32)).astype(dtype)
    m_inf = jnp.asarray(rng.normal(size=(1, 44400, 256))
                        .astype(np.float32)).astype(dtype)
    p_inf = jnp.asarray(rng.normal(size=(1, 44400, 256))
                        .astype(np.float32)).astype(dtype)
    q_veh = jnp.asarray(rng.normal(size=(1, 900, 256))
                        .astype(np.float32)).astype(dtype)
    q_inf = jnp.asarray(rng.normal(size=(1, 900, 256))
                        .astype(np.float32)).astype(dtype)

    def seq_fn(c, mv, pv, mi, pi, qv, qi):
        mv = mv + c.astype(dtype) * 0
        o1 = head.apply(params, mv, pv, qv, 1, method=CmtHead.run_decoder)
        o2 = head.apply(params, mi, pi, qi + o1[0, :, :1, :1] * 0, 1,
                        method=CmtHead.run_decoder)
        out = jnp.maximum(o1, o2)
        return out.astype(jnp.float32).sum() * 1e-20
    loop_time(seq_fn, m_veh, p_veh, m_inf, p_inf, q_veh, q_inf,
              name="[E] decoder sequential 2 agents", n=5)

    # batched: pad veh tokens to 44.4k with NEG_INF key bias
    pad = 44400 - 36400
    m_vehp = jnp.pad(m_veh, ((0, 0), (0, pad), (0, 0)))
    p_vehp = jnp.pad(p_veh, ((0, 0), (0, pad), (0, 0)))
    kb = np.zeros((2, 44400), np.float32)
    kb[0, 36400:] = NEG_INF
    kbj = jnp.asarray(kb)

    def bat_fn(c, mv, pv, mi, pi, qv, qi, kb_):
        mem = jnp.concatenate([mv + c.astype(dtype) * 0, mi], axis=0)
        mp = jnp.concatenate([pv, pi], axis=0)
        qp = jnp.concatenate([qv, qi], axis=0)
        o = head.apply(params, mem, mp, qp, 2, kb_,
                       method=CmtHead.run_decoder)
        out = jnp.maximum(o[:, 0:1], o[:, 1:2])
        return out.astype(jnp.float32).sum() * 1e-20
    loop_time(bat_fn, m_vehp, p_vehp, m_inf, p_inf, q_veh, q_inf, kbj,
              name="[E] decoder agent-batched B=2", n=5)


if __name__ == "__main__":
    main()
