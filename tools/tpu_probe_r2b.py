#!/usr/bin/env python
"""Round-2 probe B: encoder internals — downsample grids, conv neighbor
maps, occ downsample, densify, and true per-stage convs with REAL grids.
Appends to runs/tpu_probe_r2.log."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.tpu_probe_r2 import log, timeit, fetch_overhead  # noqa: E402


def main():
    from tools.tpu_pillar_probe import realistic_cloud
    from cmtcoop_tpu.ops.pillars import pillarize
    from cmtcoop_tpu.ops import pillars as pu
    from cmtcoop_tpu.ops.pillar_fused import fused_pillar_conv

    dtype = jnp.bfloat16
    pc_range = (-72.0, -72.0, -8.0, 72.0, 72.0, 0.0)
    grid = (1440, 1440, 40)
    caps = (49152, 24576, 16384, 16384)
    pts = jnp.asarray(realistic_cloud())
    msk = jnp.ones((pts.shape[0],), bool)

    pz = jax.jit(lambda p, m: pillarize(
        p, m, voxel_size=(0.1, 0.1, 0.2), pc_range=pc_range,
        grid_size=grid, max_points=10, max_voxels=65536,
        max_pillars=caps[0]))
    pcoords, pmask, occ, feats = pz(pts, msk)
    log(f"[B] active pillars: {int(np.asarray(pmask).sum())}")

    hw = (1440, 1440)
    zs = [41, 21, 11]
    grids = [(pcoords, pmask, hw, 41, occ)]
    rng = np.random.default_rng(0)

    for i in range(3):
        c, m, chw, cz, co = grids[-1]
        cap_next = caps[min(i + 1, 3)]

        dg = jax.jit(lambda c_, m_, chw=chw, cz=cz, cap=cap_next:
                     pu.pillar_downsample_grid(
                         pu.PillarGrid(c_, m_, chw, cz), cap))
        timeit(dg, c, m, name=f"[B] down_grid s{i}")
        og = dg(c, m)

        cn = jax.jit(lambda c_, m_, oc, om, chw=chw, cz=cz:
                     pu.pillar_conv_neighbor_map(
                         pu.PillarGrid(c_, m_, chw, cz),
                         pu.PillarGrid(oc, om, og.hw, og.z)))
        timeit(cn, c, m, og.coords, og.mask, name=f"[B] conv_nbr s{i}")
        nbr_dn = cn(c, m, og.coords, og.mask)

        zp = [1, 1, 0][i]
        od = jax.jit(lambda o_, n_, zp=zp: pu.occ_downsample(o_, n_, 3, 2,
                                                             zp))
        timeit(od, co, nbr_dn, name=f"[B] occ_down s{i}")
        occ_new = od(co, nbr_dn)

        nm = jax.jit(lambda c_, m_, ghw=og.hw, gz=og.z:
                     pu.pillar_neighbor_map(pu.PillarGrid(c_, m_, ghw, gz)))
        timeit(nm, og.coords, og.mask, name=f"[B] subm_nbr s{i + 1}")

        # true fused conv at this downsample (real neighbor map)
        cin = [16, 32, 64][i]
        cout = [32, 64, 128][i]
        f_in = jnp.asarray(rng.normal(size=(c.shape[0], cz, cin)), dtype)
        fc = jax.jit(lambda f_, n_, o_, cout=cout, zp=zp: fused_pillar_conv(
            f_, n_, jnp.asarray(
                rng.normal(size=(27, f_.shape[-1], cout)), jnp.float32),
            kz=3, z_stride=2, z_pad=zp, scale=jnp.ones((cout,)),
            bias=jnp.zeros((cout,)), relu=True, occ_out=o_, win=1024))
        timeit(fc, f_in, nbr_dn, occ_new, name=f"[B] fused_down s{i}")

        # true fused subm conv at next stage (real subm neighbor map)
        nbr_s = nm(og.coords, og.mask)
        zn = (cz + 2 * zp - 3) // 2 + 1
        f_n = jnp.asarray(
            rng.normal(size=(og.coords.shape[0], zn, cout)), dtype)
        fs = jax.jit(lambda f_, n_, o_, cout=cout: fused_pillar_conv(
            f_, n_, jnp.asarray(
                rng.normal(size=(27, cout, cout)), jnp.float32),
            kz=3, z_stride=1, z_pad=1, scale=jnp.ones((cout,)),
            bias=jnp.zeros((cout,)), relu=True, occ_out=o_))
        timeit(fs, f_n, nbr_s, occ_new, name=f"[B] fused_subm s{i + 1}")

        grids.append((og.coords, og.mask, og.hw, zn, occ_new))

    # conv_out + densify at final grid
    c, m, chw, cz, co = grids[-1]
    p = c.shape[0]
    ident = jnp.where(m, jnp.arange(p, dtype=jnp.int32), p)[:, None]
    od = jax.jit(lambda o_, n_: pu.occ_downsample(o_, n_, 3, 2, 0))
    occ_out = od(co, ident)
    fo = jax.jit(lambda f_, n_, o_: fused_pillar_conv(
        f_, n_, jnp.asarray(rng.normal(size=(3, 128, 128)), jnp.float32),
        kz=3, z_stride=2, z_pad=0, scale=jnp.ones((128,)),
        bias=jnp.zeros((128,)), relu=True, occ_out=o_))
    f_last = jnp.asarray(rng.normal(size=(p, cz, 128)), dtype)
    timeit(fo, f_last, ident, occ_out, name="[B] conv_out")
    zo = (cz - 3) // 2 + 1
    dn = jax.jit(lambda c_, m_, f_: pu.pillars_to_dense(
        pu.PillarGrid(c_, m_, chw, zo), f_))
    f_out = jnp.asarray(rng.normal(size=(p, zo, 128)), dtype)
    timeit(dn, c, m, f_out, name="[B] pillars_to_dense")


if __name__ == "__main__":
    main()
