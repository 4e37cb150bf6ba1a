#!/usr/bin/env python
"""A/B microbench of fused_pillar_conv variants at bench-calibrated
stage shapes (subm + down convs, all 4 levels)."""
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


def main():
    log("==== probe_pillar_kernel ====")
    fetch_overhead()
    pts, mask = bench_cloud()
    kw = dict(voxel_size=(0.1, 0.1, 0.2),
              pc_range=(-72.0, -72.0, -8.0, 72.0, 72.0, 0.0),
              grid_size=(1440, 1440, 40), max_points=10,
              max_voxels=65536, max_pillars=38400)
    pc, pm, occ, feats = jax.jit(
        lambda p, m: pu.pillarize(p, m, **kw))(pts, mask)
    grid = pu.PillarGrid(pc, pm, (1440, 1440), 41)
    nbr = jax.jit(lambda c, m: pu.pillar_neighbor_map(
        pu.PillarGrid(c, m, (1440, 1440), 41)))(pc, pm)
    rng = np.random.default_rng(0)

    occ41 = np.asarray(occ)

    def occ_for(z):
        # real stage-0 occupancy downscaled in z for deeper-stage shapes
        if z == occ41.shape[1]:
            return occ41
        f = occ41.shape[1] / z
        idx = (np.arange(occ41.shape[1]) / f).astype(int)
        out = np.zeros((occ41.shape[0], z), bool)
        np.maximum.at(out.T, idx, occ41.T)
        return out

    def bench_subm(cin, cout, z, name, win=256, bp=128):
        p = pc.shape[0]
        oz = jnp.asarray(occ_for(z))
        x = jnp.asarray(rng.normal(size=(p, z, cin)) * 0.1, DT)
        x = x * oz[..., None].astype(DT)
        w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.05, DT)
        sc = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
        bi = jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32)

        def f(c, x_, w_):
            o = fused_pillar_conv(
                x_ + (c * 1e-30).astype(DT), nbr, w_, kz=3, z_stride=1,
                z_pad=1, scale=sc, bias=bi, occ_out=oz, relu=True,
                win=win, subm=True, bp=bp)
            return o.astype(jnp.float32).sum() * 1e-20
        loop_time(f, x, w, name=f"  subm {name} z{z} {cin}->{cout} "
                               f"win{win} bp{bp}", n=20)

    win = int(os.environ.get("CMTCOOP_PROBE_WIN", 256))
    bp = int(os.environ.get("CMTCOOP_PROBE_BP", 128))
    bench_subm(16, 16, 41, "s0", win, bp)
    bench_subm(32, 32, 21, "s1", win, bp)
    bench_subm(64, 64, 11, "s2", win, bp)
    bench_subm(128, 128, 5, "s3", win, bp)


if __name__ == "__main__":
    main()
