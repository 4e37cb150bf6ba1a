#!/usr/bin/env python
"""Consolidated TPU measurement pass — writes incremental results to
`runs/tpu_measure.log` (unbuffered; the relay environment makes interactive
profiling painful, so everything is measured in one exclusive session)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOG = open(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs", "tpu_measure.log"), "a", 1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")
    LOG.flush()


def timeit(fn, *args, iters=5, name=""):
    t0 = time.time()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    log(f"{name}: compile+first {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    log(f"{name}: {dt * 1e3:.1f} ms")
    return dt


def main():
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    from cmtcoop_tpu.ops.voxelize import voxelize, hard_simple_vfe
    from cmtcoop_tpu.models.sparse_encoder import SparseEncoder
    from cmtcoop_tpu.models.second import SECOND, SECONDFPN
    from cmtcoop_tpu.models.vovnet import VoVNet, CPFPN
    from cmtcoop_tpu.models.cmt_head import AgentInputs, CmtHead

    pc_range = (-72.0, -72.0, -8.0, 72.0, 72.0, 0.0)
    grid = (1440, 1440, 40)
    n_points, max_voxels = 150000, 120000

    pts = rng.uniform(-70, 70, (n_points, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-8, 0, n_points)
    pts_j = jnp.asarray(pts)
    mask_j = jnp.ones((n_points,), bool)

    vox_fn = jax.jit(lambda p, m: voxelize(
        p, m, voxel_size=(0.1, 0.1, 0.2), pc_range=pc_range,
        grid_size=grid, max_points=10, max_voxels=max_voxels))
    timeit(vox_fn, pts_j, mask_j, name="voxelize_150k")
    vox = vox_fn(pts_j, mask_j)
    feats = hard_simple_vfe(vox)
    log(f"occupied voxels: {int(np.asarray(vox.mask).sum())}")

    enc = SparseEncoder(stage_caps=(60000, 60000, 60000, 60000),
                        dtype=dtype)
    v = enc.init(key, feats[None], vox.coords[None], vox.mask[None])
    enc_fn = jax.jit(lambda v_, f, c, m: enc.apply(v_, f, c, m))
    timeit(enc_fn, v, feats[None], vox.coords[None], vox.mask[None],
           name="sparse_encoder")
    bev = enc_fn(v, feats[None], vox.coords[None], vox.mask[None])
    bev = bev.astype(dtype)

    sec = SECOND(dtype=dtype)
    fpn = SECONDFPN(dtype=dtype)
    vs = sec.init(key, bev)
    sec_fn = jax.jit(lambda v_, x: sec.apply(v_, x))
    outs = sec_fn(vs, bev)
    vf = fpn.init(key, outs)
    fpn_fn = jax.jit(lambda v_, x: fpn.apply(v_, x))
    timeit(sec_fn, vs, bev, name="SECOND")
    timeit(fpn_fn, vf, outs, name="SECONDFPN")
    bev512 = fpn_fn(vf, outs)

    views = 4
    imgs = jnp.asarray(rng.normal(
        size=(views, 640, 1600, 3)).astype(np.float32)).astype(dtype)
    bb = VoVNet(dtype=dtype)
    vb = bb.init(key, imgs)
    bb_fn = jax.jit(lambda v_, x: bb.apply(v_, x))
    timeit(bb_fn, vb, imgs, name="vovnet99_4x640x1600")
    feats_i = bb_fn(vb, imgs)
    neck = CPFPN(dtype=dtype)
    vn = neck.init(key, [feats_i["stage4"], feats_i["stage5"]])
    neck_fn = jax.jit(lambda v_, a, b_: neck.apply(v_, [a, b_])[0])
    timeit(neck_fn, vn, feats_i["stage4"], feats_i["stage5"], name="cpfpn")
    f0 = neck_fn(vn, feats_i["stage4"], feats_i["stage5"])
    img_feats = f0.reshape(1, views, *f0.shape[1:])

    head = CmtHead(dtype=dtype, max_gt=128)
    l2i = jnp.asarray(np.tile(
        np.eye(4, dtype=np.float32), (1, views, 1, 1)))
    agent = AgentInputs(bev512, img_feats, l2i, l2i, (640, 1600))
    vh = head.init(key, [agent])
    head_fn = jax.jit(lambda v_, bev_, img_: head.apply(
        v_, [AgentInputs(bev_, img_, l2i, l2i, (640, 1600))])[0][0][
            "cls_logits"])
    timeit(head_fn, vh, bev512, img_feats, name="cmt_head_1agent")
    log("done")


if __name__ == "__main__":
    main()
