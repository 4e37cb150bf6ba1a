#!/usr/bin/env python
"""Round-2 TPU probe: current LiDAR-path component costs at bench shapes.

Times pillarize, per-stage neighbor maps, the full pillar encoder (fused
eval path), SECOND+FPN, and the per-stage fused convs, to locate the
remaining gap between 3.2 FPS and the >=6 FPS target.
Appends to runs/tpu_probe_r2.log.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

LOG = open(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs", "tpu_probe_r2.log"), "a", 1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


_FETCH = None


def fetch_overhead():
    global _FETCH
    if _FETCH is None:
        f = jax.jit(lambda x: x * 1.0)
        x = jnp.ones((8, 128))
        float(jnp.sum(f(x)))
        t0 = time.time()
        n = 20
        for _ in range(n):
            float(jnp.sum(f(x)))
        _FETCH = (time.time() - t0) / n
        log(f"fetch_overhead: {_FETCH * 1e3:.1f} ms")
    return _FETCH


def timeit(fn, *args, iters=10, name=""):
    t0 = time.time()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    log(f"{name}: compile+first {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.time() - t0) / iters - fetch_overhead()
    log(f"{name}: {dt * 1e3:.2f} ms")
    return dt


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.tpu_pillar_probe import realistic_cloud
    from cmtcoop_tpu.ops.pillars import pillarize
    from cmtcoop_tpu.models.pillar_encoder import PillarSparseEncoder
    from cmtcoop_tpu.models.second import SECOND, SECONDFPN

    dtype = jnp.bfloat16
    pc_range = (-72.0, -72.0, -8.0, 72.0, 72.0, 0.0)
    grid = (1440, 1440, 40)
    caps = (49152, 24576, 16384, 16384)
    pts = jnp.asarray(realistic_cloud())[None]
    msk = jnp.ones((1, pts.shape[1]), bool)

    pz = jax.jit(lambda p, m: jax.lax.map(
        lambda pm: pillarize(
            pm[0], pm[1], voxel_size=(0.1, 0.1, 0.2), pc_range=pc_range,
            grid_size=grid, max_points=10, max_voxels=65536,
            max_pillars=caps[0]), (p, m)))
    timeit(pz, pts, msk, name="pillarize_72k")
    prebuilt = jax.tree.map(lambda x: x, pz(pts, msk))
    log(f"active pillars: {int(np.asarray(prebuilt[1]).sum())}")

    enc = PillarSparseEncoder(pillar_caps=caps, dtype=dtype)
    vs = jax.jit(lambda pb: enc.init(
        jax.random.PRNGKey(0), None, None, None, False, prebuilt=pb))(
        prebuilt)

    @jax.jit
    def enc_fwd(vs, pb):
        return enc.apply(vs, None, None, None, False, prebuilt=pb)
    timeit(enc_fwd, vs, prebuilt, name="pillar_encoder_full")

    bev = enc_fwd(vs, prebuilt)
    log(f"bev {bev.shape}")
    sec = SECOND(dtype=dtype)
    svs = jax.jit(sec.init)(jax.random.PRNGKey(0), bev)
    timeit(jax.jit(lambda v, x: sec.apply(v, x)), svs, bev, name="SECOND")
    outs = jax.jit(lambda v, x: sec.apply(v, x))(svs, bev)
    fpn = SECONDFPN(dtype=dtype)
    fvs = jax.jit(fpn.init)(jax.random.PRNGKey(0), outs)
    timeit(jax.jit(lambda v, x: fpn.apply(v, x)), fvs, outs,
           name="SECONDFPN")

    # neighbor maps at each stage cap
    from cmtcoop_tpu.ops import pillars as pu
    pcoords, pmask = prebuilt[0], prebuilt[1]
    nbr_fn = jax.jit(lambda c, m: jax.lax.map(
        lambda cm: pu.pillar_neighbor_map(
            pu.PillarGrid(cm[0], cm[1], (1440, 1440), 41)), (c, m)))
    timeit(nbr_fn, pcoords, pmask, name="nbr_map_49k")

    # fused conv per stage (synthetic feats at stage shapes)
    from cmtcoop_tpu.ops.pillar_fused import fused_pillar_conv
    rng = np.random.default_rng(0)
    nbr = np.asarray(nbr_fn(pcoords, pmask))[0]
    shapes = [("s0_subm", caps[0], 41, 16, 16),
              ("s1_subm", caps[1], 21, 32, 32),
              ("s2_subm", caps[2], 11, 64, 64),
              ("s3_subm", caps[3], 5, 128, 128)]
    for tag, p, z, cin, cout in shapes:
        feats = jnp.asarray(rng.normal(size=(p, z, cin)), dtype)
        if p == caps[0]:
            nb = jnp.asarray(nbr)
        else:
            # synthetic compact neighbor map at this cap
            nb_np = np.clip(nbr[:p] % p, 0, p - 1)
            nb = jnp.asarray(nb_np)
        w = jnp.asarray(rng.normal(size=(27, cin, cout)), jnp.float32)
        occ = jnp.asarray(np.ones((p, z), np.float32))
        f = jax.jit(lambda f_, n_, o_: fused_pillar_conv(
            f_, n_, w, kz=3, z_stride=1, z_pad=1,
            scale=jnp.ones((cout,)), bias=jnp.zeros((cout,)),
            relu=True, occ_out=o_))
        timeit(f, feats, nb, occ, name=f"fused_{tag}_{p}x{z}x{cin}->{cout}")


if __name__ == "__main__":
    main()
