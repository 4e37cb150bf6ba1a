#!/usr/bin/env python
"""A/B of the DOWN (strided, fold_occ) fused conv at bench shapes:
window width, block size, KPACK — finds what actually bounds it
(probe_trace: down0/1 cost 1.9/1.35 ms vs ~0.9 for subm convs and did
not shrink with a 25% window cut)."""
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

DT = jnp.bfloat16


def main():
    log("==== probe_down_conv ====")
    fetch_overhead()
    pts, mask = bench_cloud()
    kw = dict(voxel_size=(0.1, 0.1, 0.2),
              pc_range=(-72.0, -72.0, -8.0, 72.0, 72.0, 0.0),
              grid_size=(1440, 1440, 40), max_points=10,
              max_voxels=65536, max_pillars=38400)
    pc, pm, occ, _ = jax.jit(
        lambda p, m: pu.pillarize(p, m, **kw))(pts, mask)
    grid = pu.PillarGrid(pc, pm, (1440, 1440), 41)
    og = jax.jit(lambda c, m: pu.pillar_downsample_grid(
        pu.PillarGrid(c, m, (1440, 1440), 41), 40960).coords)(pc, pm)
    ogg = pu.pillar_downsample_grid(grid, 40960)
    nbr = jax.jit(lambda: pu.pillar_conv_neighbor_map(
        grid, ogg, window=256))()
    rng = np.random.default_rng(0)
    z, cin, cout = 41, 16, 32
    p_in = pc.shape[0]
    zc = z * cin
    zcp = -(-(zc) // 128) * 128
    x = jnp.asarray(rng.normal(size=(p_in, zc)) * 0.1, DT)
    occv = np.asarray(occ)
    rows = jnp.concatenate(
        [x * jnp.asarray(occv.repeat(cin, 1), DT),
         jnp.asarray(occv, DT),
         jnp.zeros((p_in, zcp - zc - z), DT)], axis=1)
    w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.05, DT)
    sc = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
    bi = jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32)

    from cmtcoop_tpu.ops import pillar_fused as pf

    def run(win, bp, kpack, name):
        pf.KPACK = kpack

        def f(c, x_, w_):
            o, oc = pf.fused_pillar_conv(
                x_ + (c * 1e-30).astype(DT), nbr, w_, kz=3, z_stride=2,
                z_pad=1, scale=sc, bias=bi, relu=True, win=win, bp=bp,
                fold_occ=True, packed_shape=(z, cin))
            return (o.astype(jnp.float32).sum() * 1e-20
                    + oc.astype(jnp.float32).sum() * 1e-20)
        loop_time(f, rows, w, name=f"  down0 {name} win{win} bp{bp} "
                                   f"kpack{int(kpack)}", n=20)

    import cmtcoop_tpu.ops.pillar_fused as _pf
    run(384, 128, False, "base")
    _pf.ABLATE = "nogather"
    run(384, 128, False, "nogather")
    _pf.ABLATE = "noband"
    run(384, 128, False, "noband")
    _pf.ABLATE = ""


if __name__ == "__main__":
    main()
