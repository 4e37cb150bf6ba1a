#!/usr/bin/env python
"""Stage-internals probe of the pillar encoder at REAL bench shapes.

Builds the actual grid/map chain from the calibrated bench cloud, then
loop-times each component separately: subm neighbor maps, downsample
grids, conv neighbor maps, subm convs, down convs (fold_occ) — per level.
The `--what lidar` probe only gives the encoder total; this attributes it.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from tools.tpu_probe import bench_cloud, fetch_overhead, log, loop_time
from cmtcoop_tpu.ops import pillars as pu
from cmtcoop_tpu.ops.pillar_fused import fused_pillar_conv

DT = jnp.bfloat16
CAPS = (38400, 40960, 24064, 11264)
CHS = (16, 32, 64, 128)
ZS = (41, 21, 11, 5)
DOWN_ZPADS = (1, 1, 0)
SUBM_WIN = 256
DOWN_WINS = (384, 512, 640)


def main():
    log("==== probe_encoder_parts ====")
    fetch_overhead()
    pts, mask = bench_cloud()
    kw = dict(voxel_size=(0.1, 0.1, 0.2),
              pc_range=(-72.0, -72.0, -8.0, 72.0, 72.0, 0.0),
              grid_size=(1440, 1440, 40), max_points=10,
              max_voxels=65536, max_pillars=CAPS[0])
    pc, pm, occ0, feats = jax.jit(
        lambda p, m: pu.pillarize(p, m, **kw))(pts, mask)
    rng = np.random.default_rng(0)

    # build the real chain on device once
    grids, occs, nbrs, dn_grids, dn_nbrs = [], [], [], [], []
    grid = pu.PillarGrid(pc, pm, (1440, 1440), 41)
    occ = occ0
    for lvl in range(4):
        grids.append(grid)
        occs.append(occ)
        nbrs.append(jax.jit(pu.pillar_neighbor_map)(grid))
        if lvl < 3:
            og = jax.jit(lambda g, c=CAPS[lvl + 1]:
                         pu.pillar_downsample_grid(g, c))(grid)
            nbd = jax.jit(pu.pillar_conv_neighbor_map)(grid, og)
            dn_grids.append(og)
            dn_nbrs.append(nbd)
            occ = jax.jit(lambda o, n, zp=DOWN_ZPADS[lvl]:
                          pu.occ_downsample(o, n, 3, 2, zp))(occ, nbd)
            oh = (grid.hw[0] + 2 - 3) // 2 + 1
            ow = (grid.hw[1] + 2 - 3) // 2 + 1
            grid = pu.PillarGrid(og.coords, og.mask, (oh, ow), ZS[lvl + 1])

    # --- map building ---
    for lvl in range(4):
        g = grids[lvl]

        def nmap(c, coords, m):
            gg = pu.PillarGrid(
                coords + (c * 0).astype(coords.dtype), m, g.hw, g.z)
            return pu.pillar_neighbor_map(gg).sum().astype(jnp.float32) \
                * 1e-20
        loop_time(nmap, g.coords, g.mask,
                  name=f"  subm nbr map L{lvl} P={g.coords.shape[0]}", n=20)
    for lvl in range(3):
        g = grids[lvl]

        def dgrid(c, coords, m, cap=CAPS[lvl + 1]):
            gg = pu.PillarGrid(
                coords + (c * 0).astype(coords.dtype), m, g.hw, g.z)
            og = pu.pillar_downsample_grid(gg, cap)
            return og.coords.sum().astype(jnp.float32) * 1e-20
        loop_time(dgrid, g.coords, g.mask,
                  name=f"  down grid L{lvl} P={g.coords.shape[0]}", n=20)

        og = dn_grids[lvl]

        def dmap(c, coords, m, ocoords, om):
            gg = pu.PillarGrid(
                coords + (c * 0).astype(coords.dtype), m, g.hw, g.z)
            out_g = pu.PillarGrid(ocoords, om, og.hw, og.z)
            return pu.pillar_conv_neighbor_map(gg, out_g).sum().astype(
                jnp.float32) * 1e-20
        loop_time(dmap, g.coords, g.mask, og.coords, og.mask,
                  name=f"  conv nbr map L{lvl}", n=20)

    # --- convs at real shapes ---
    for lvl in range(4):
        g, oz, nbr = grids[lvl], occs[lvl], nbrs[lvl]
        p, z, ch = g.coords.shape[0], ZS[lvl], CHS[lvl]
        x = jnp.asarray(rng.normal(size=(p, z, ch)) * 0.1, DT)
        x = x * oz[..., None].astype(DT)
        w = jnp.asarray(rng.normal(size=(27, ch, ch)) * 0.05, DT)
        sc = jnp.asarray(rng.uniform(0.5, 1.5, ch), jnp.float32)
        bi = jnp.asarray(rng.normal(size=ch) * 0.1, jnp.float32)

        def f(c, x_, w_):
            o = fused_pillar_conv(
                x_ + (c * 1e-30).astype(DT), nbr, w_, kz=3, z_stride=1,
                z_pad=1, scale=sc, bias=bi, occ_out=oz, relu=True,
                win=SUBM_WIN, subm=True)
            return o.astype(jnp.float32).sum() * 1e-20
        loop_time(f, x, w, name=f"  subm conv L{lvl} P={p} z{z} c{ch}",
                  n=20)

    for lvl in range(3):
        g, oz = grids[lvl], occs[lvl]
        nbd = dn_nbrs[lvl]
        p, z, cin = g.coords.shape[0], ZS[lvl], CHS[lvl]
        cout = CHS[lvl + 1]
        zp = DOWN_ZPADS[lvl]
        x = jnp.asarray(rng.normal(size=(p, z, cin)) * 0.1, DT)
        x = x * oz[..., None].astype(DT)
        w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.05, DT)
        sc = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
        bi = jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32)

        def f(c, x_, w_):
            o, onew = fused_pillar_conv(
                x_ + (c * 1e-30).astype(DT), nbd, w_, kz=3, z_stride=2,
                z_pad=zp, scale=sc, bias=bi, relu=True,
                win=DOWN_WINS[lvl], occ_in=oz, fold_occ=True)
            return (o.astype(jnp.float32).sum()
                    + onew.sum().astype(jnp.float32)) * 1e-20
        loop_time(f, x, w,
                  name=f"  down conv L{lvl} {cin}->{cout} "
                       f"win{DOWN_WINS[lvl]}", n=20)


if __name__ == "__main__":
    main()
