#!/usr/bin/env python
"""Component-level latency breakdown on the real TPU (dev tool).

Times each stage of the flagship path separately: voxelizer, sparse encoder,
SECOND+FPN, VoVNet+CPFPN, head(decoder+PEs). Forces host fetches because
block_until_ready via the axon relay returns early.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5, name=""):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.time() - t0) / iters
    print(f"{name:24s} {dt * 1e3:9.1f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--points", type=int, default=150000)
    ap.add_argument("--max-voxels", type=int, default=120000)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--skip", default="",
                    help="comma list: voxel,sparse,second,vovnet,head")
    args = ap.parse_args()
    dtype = dict(bfloat16=jnp.bfloat16, float32=jnp.float32)[args.dtype]
    skip = set(args.skip.split(","))

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    from cmtcoop_tpu.ops.voxelize import voxelize, hard_simple_vfe
    from cmtcoop_tpu.models.sparse_encoder import SparseEncoder
    from cmtcoop_tpu.models.second import SECOND, SECONDFPN
    from cmtcoop_tpu.models.vovnet import VoVNet, CPFPN
    from cmtcoop_tpu.models.cmt_head import AgentInputs, CmtHead

    pc_range = (-72.0, -72.0, -8.0, 72.0, 72.0, 0.0)
    grid = (1440, 1440, 40)

    pts = rng.uniform(-70, 70, (args.points, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-8, 0, args.points)
    pts_j = jnp.asarray(pts)
    mask_j = jnp.ones((args.points,), bool)

    vox_fn = jax.jit(lambda p, m: voxelize(
        p, m, voxel_size=(0.1, 0.1, 0.2), pc_range=pc_range,
        grid_size=grid, max_points=10, max_voxels=args.max_voxels))
    if "voxel" not in skip:
        timeit(vox_fn, pts_j, mask_j, name="voxelize(150k pts)")
    vox = vox_fn(pts_j, mask_j)
    feats = hard_simple_vfe(vox)

    if "sparse" not in skip:
        enc = SparseEncoder(stage_caps=(args.max_voxels // 2,) * 4,
                            dtype=dtype)
        v = enc.init(key, feats[None], vox.coords[None], vox.mask[None])
        enc_fn = jax.jit(lambda v_, f, c, m: enc.apply(v_, f, c, m))
        timeit(enc_fn, v, feats[None], vox.coords[None], vox.mask[None],
               name="sparse encoder")
        bev = enc_fn(v, feats[None], vox.coords[None], vox.mask[None])
    else:
        bev = jnp.zeros((1, 180, 180, 256), dtype)

    if "second" not in skip:
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
    else:
        bev512 = jnp.zeros((1, 180, 180, 512), dtype)

    if "vovnet" not in skip:
        imgs = jnp.asarray(rng.normal(
            size=(args.views, 640, 1600, 3)).astype(np.float32)).astype(
                dtype)
        bb = VoVNet(dtype=dtype)
        vb = bb.init(key, imgs)
        bb_fn = jax.jit(lambda v_, x: bb.apply(v_, x))
        feats_i = bb_fn(vb, imgs)
        timeit(bb_fn, vb, imgs, name="VoVNet-99 (4x640x1600)")
        neck = CPFPN(dtype=dtype)
        vn = neck.init(key, [feats_i["stage4"], feats_i["stage5"]])
        neck_fn = jax.jit(
            lambda v_, a, b_: neck.apply(v_, [a, b_])[0])
        timeit(neck_fn, vn, feats_i["stage4"], feats_i["stage5"],
               name="CPFPN")
        img_feats = neck_fn(vn, feats_i["stage4"], feats_i["stage5"])
        img_feats = img_feats[None]  # (1, V, h, w, c) after reshape
        img_feats = img_feats.reshape(1, args.views, *img_feats.shape[2:])
    else:
        img_feats = jnp.zeros((1, args.views, 40, 100, 256), dtype)

    if "head" not in skip:
        head = CmtHead(dtype=dtype, max_gt=128)
        l2i = jnp.asarray(np.tile(
            np.eye(4, dtype=np.float32), (1, args.views, 1, 1)))
        agent = AgentInputs(bev512, img_feats, l2i, l2i, (640, 1600))
        vh = head.init(key, [agent])
        head_fn = jax.jit(
            lambda v_, bev_, img_: head.apply(
                v_, [AgentInputs(bev_, img_, l2i, l2i, (640, 1600))])[0][0][
                    "cls_logits"])
        timeit(head_fn, vh, bev512, img_feats, name="CmtHead (1 agent)")


if __name__ == "__main__":
    main()
