#!/usr/bin/env python
"""Round-2 probe C: loop-amortized per-op timings at bench shapes.

The axon relay adds ~30 ms (high-variance) per host fetch, which buries
every sub-10 ms op. This probe runs each op N times inside ONE jit with a
carry dependence (input perturbed by the running sum) so XLA cannot CSE or
reorder, then fetches once: per-op time = (loop_time - loop_overhead) / N.
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

from tools.tpu_probe_r2 import log  # noqa: E402

N = 20


def loop_time(make_fn, *args, name="", n=N):
    """Time n sequential applications of make_fn inside one jit.

    make_fn(c, *args) -> scalar float32; c is the carry (forces order).
    """
    @jax.jit
    def run(*a):
        def body(i, c):
            return c + make_fn(c, *a)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    out = run(*args)
    t0 = time.time()
    out = float(run(*args))
    first = time.time() - t0  # includes fetch overhead once
    t0 = time.time()
    out2 = float(run(*args))
    second = time.time() - t0
    # subtract the ~30-40 ms relay fetch that lands on each timed call —
    # without this every n=5 measurement reads ~7 ms high
    from tools.tpu_probe_r2 import fetch_overhead
    per = (min(first, second) - fetch_overhead()) / n * 1e3
    log(f"[C] {name}: {per:.2f} ms/op (n={n}, fetch incl. "
        f"{min(first, second)*1e3:.0f} ms total)")
    return per


def main():
    from tools.tpu_pillar_probe import realistic_cloud
    from cmtcoop_tpu.ops.pillars import pillarize
    from cmtcoop_tpu.ops import pillars as pu
    from cmtcoop_tpu.models.pillar_encoder import PillarSparseEncoder
    from cmtcoop_tpu.models.second import SECOND, SECONDFPN

    dtype = jnp.bfloat16
    pc_range = (-72.0, -72.0, -8.0, 72.0, 72.0, 0.0)
    grid_size = (1440, 1440, 40)
    caps = (49152, 24576, 16384, 16384)
    pts = jnp.asarray(realistic_cloud())
    msk = jnp.ones((pts.shape[0],), bool)
    log(f"[C] ==== probe C start (N={N}) ====")

    # ---- pillarize ----
    def pz_fn(c, p, m):
        out = pillarize(
            p + c * 0e-20, m, voxel_size=(0.1, 0.1, 0.2),
            pc_range=pc_range, grid_size=grid_size, max_points=10,
            max_voxels=65536, max_pillars=caps[0])
        return out[3].astype(jnp.float32).sum() * 1e-20
    loop_time(pz_fn, pts, msk, name="pillarize", n=5)

    pz = jax.jit(lambda p, m: pillarize(
        p, m, voxel_size=(0.1, 0.1, 0.2), pc_range=pc_range,
        grid_size=grid_size, max_points=10, max_voxels=65536,
        max_pillars=caps[0]))
    pcoords, pmask, occ, feats = pz(pts, msk)

    # ---- full encoder ----
    enc = PillarSparseEncoder(pillar_caps=caps, dtype=dtype)
    prebuilt = (pcoords[None], pmask[None], occ[None],
                feats.astype(dtype)[None])
    variables = jax.jit(
        lambda k, pb: enc.init(k, None, None, None, False, pb)
    )(jax.random.PRNGKey(0), prebuilt)

    def enc_fn(c, vs, pb):
        pb = (pb[0], pb[1], pb[2], pb[3] + c.astype(dtype) * 0)
        bev = enc.apply(vs, None, None, None, False, pb)
        return bev.astype(jnp.float32).sum() * 1e-20
    loop_time(enc_fn, variables, prebuilt, name="encoder_full", n=5)

    # ---- neighbor maps at each level (real grids) ----
    grid = pu.PillarGrid(pcoords, pmask, (1440, 1440), 41)
    grids = [grid]
    occs = [occ]
    for i in range(3):
        g = grids[-1]
        og = pu.pillar_downsample_grid(g, caps[i + 1])
        grids.append(og)
        nbr_dn = pu.pillar_conv_neighbor_map(g, og)
        occs.append(pu.occ_downsample(occs[-1], nbr_dn, 3, 2,
                                      [1, 1, 0][i]))

    for i, g in enumerate(grids):
        def nbr_fn(c, co_, m_):
            gg = pu.PillarGrid(
                co_ + (c * 0).astype(co_.dtype), m_, g.hw, g.z)
            return pu.pillar_neighbor_map(gg).astype(jnp.float32).sum(
            ) * 1e-20
        loop_time(nbr_fn, g.coords, g.mask, name=f"subm_nbr L{i}")

    for i in range(3):
        g, og = grids[i], grids[i + 1]

        def down_fn(c, co_, m_):
            gg = pu.PillarGrid(
                co_ + (c * 0).astype(co_.dtype), m_, g.hw, g.z)
            o = pu.pillar_downsample_grid(gg, caps[i + 1])
            return o.coords.astype(jnp.float32).sum() * 1e-20
        loop_time(down_fn, g.coords, g.mask, name=f"down_grid s{i}")

        def cnbr_fn(c, co_, m_, oc_, om_):
            gg = pu.PillarGrid(
                co_ + (c * 0).astype(co_.dtype), m_, g.hw, g.z)
            o = pu.PillarGrid(oc_, om_, og.hw, og.z)
            return pu.pillar_conv_neighbor_map(gg, o).astype(
                jnp.float32).sum() * 1e-20
        loop_time(cnbr_fn, g.coords, g.mask, og.coords, og.mask,
                  name=f"conv_nbr s{i}")

    # ---- per-conv costs with real grids, loop-amortized ----
    from cmtcoop_tpu.ops.pillar_fused import fused_pillar_conv
    rng = np.random.default_rng(0)
    zs = [41, 21, 11, 5]
    chans = [16, 32, 64, 128]
    wins = [256, 256, 256, 256]
    for i, g in enumerate(grids):
        p_, z_, c_ = g.coords.shape[0], zs[i], chans[i]
        x = jnp.asarray(rng.normal(size=(p_, z_, c_)).astype(np.float32)
                        ).astype(dtype)
        w = jnp.asarray(
            rng.normal(size=(27, c_, c_)).astype(np.float32) * 0.1)
        nbr = pu.pillar_neighbor_map(g)
        oc = occs[i]

        def conv_fn(c, x_, nbr_, w_, oc_):
            y = fused_pillar_conv(
                x_ + c.astype(dtype) * 0, nbr_, w_,
                scale=jnp.ones((c_,)), bias=jnp.zeros((c_,)),
                occ_out=oc_, relu=True, win=wins[i], subm=True)
            return y.astype(jnp.float32).sum() * 1e-20
        loop_time(conv_fn, x, nbr, w, oc, name=f"subm_conv L{i} "
                  f"{p_}x{z_}x{c_}")

    # ---- densify ----
    g3 = grids[3]
    x3 = jnp.asarray(rng.normal(size=(g3.coords.shape[0], 2, 128)
                                ).astype(np.float32)).astype(dtype)

    def dens_fn(c, x_):
        d = pu.pillars_to_dense(
            pu.PillarGrid(g3.coords, g3.mask, g3.hw, 2),
            x_ + c.astype(dtype) * 0)
        return d.astype(jnp.float32).sum() * 1e-20
    loop_time(dens_fn, x3, name="densify 180x180x256")

    # ---- SECOND + FPN ----
    bev = jnp.asarray(rng.normal(size=(1, 180, 180, 256))
                      .astype(np.float32)).astype(dtype)
    sec = SECOND((128, 256), (5, 5), dtype=dtype)
    sv = jax.jit(lambda k, b: sec.init(k, b, False))(
        jax.random.PRNGKey(0), bev)

    def sec_fn(c, vs, b):
        outs = sec.apply(vs, b + c.astype(dtype) * 0, False)
        return outs[-1].astype(jnp.float32).sum() * 1e-20
    loop_time(sec_fn, sv, bev, name="SECOND")

    fpn = SECONDFPN((256, 256), dtype=dtype)
    outs = sec.apply(sv, bev, False)
    fv = jax.jit(lambda k, o: fpn.init(k, o, False))(
        jax.random.PRNGKey(0), outs)

    def fpn_fn(c, vs, o):
        o = [x + c.astype(dtype) * 0 for x in o]
        return fpn.apply(vs, o, False).astype(jnp.float32).sum() * 1e-20
    loop_time(fpn_fn, fv, outs, name="SECONDFPN")


if __name__ == "__main__":
    main()
