#!/usr/bin/env python
"""Attribute the encoder's neighbor-map/grid build time at bench shapes:
subm maps per level, downsample grid + conv map per level, on a realistic
ray-cast cloud (same generator as bench.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.tpu_probe import fetch_overhead, log, loop_time  # noqa: E402

from cmtcoop_tpu.ops import pillars as pu  # noqa: E402
from cmtcoop_tpu.ops.pillars import pillarize  # noqa: E402
from __graft_entry__ import _coop_batch  # noqa: E402

CAPS = (38400, 40960, 24064, 11264)
MAP_WINS = (256, 448, 512)


def ieps(c):
    """Runtime-zero int perturbation the algebraic simplifier can NOT fold
    (int * 0 and float * 0 both fold; (c * 1e-30).astype(int32) cannot —
    the carry's value is unknown at compile time)."""
    return (c * 1e-30).astype(jnp.int32)


def main():
    log(f"==== probe_maps (bench cloud, caps {CAPS}) ====")
    fetch_overhead()
    batch = _coop_batch(batch_size=1, n_points=65536, veh_views=0,
                        infra_views=0, img_hw=(32, 64))
    pts = batch["infrastructure_points"][0]
    msk = batch["infrastructure_points_mask"][0]

    pc, pm, occ, x = jax.jit(lambda p, m: pillarize(
        p, m, voxel_size=(0.1, 0.1, 0.2),
        pc_range=(-72.0, -72.0, -8.0, 72.0, 72.0, 0.0),
        grid_size=(1440, 1440, 40), max_points=10,
        max_voxels=65536, max_pillars=CAPS[0]))(pts, msk)
    jax.block_until_ready(pc)

    grids = []
    g = pu.PillarGrid(pc, pm, (1440, 1440), 41)
    grids.append(g)
    for i in range(3):
        og = jax.jit(lambda c, m, hw, z, cap: pu.pillar_downsample_grid(
            pu.PillarGrid(c, m, hw, z), cap),
            static_argnums=(2, 3, 4))(g.coords, g.mask, g.hw, g.z,
                                      CAPS[i + 1])
        # the jitted call traces hw into arrays; rebuild statically
        hw = ((g.hw[0] + 2 - 3) // 2 + 1, (g.hw[1] + 2 - 3) // 2 + 1)
        g = pu.PillarGrid(og.coords, og.mask, hw, g.z)
        grids.append(g)
        log(f"  level{i+1}: hw={g.hw} occ={int(g.mask.sum())}"
            f" cap={CAPS[i+1]}")

    for i, g in enumerate(grids):
        def subm(c, cm, g=g):
            nb = pu.pillar_neighbor_map(
                pu.PillarGrid(cm[0] + ieps(c), cm[1],
                              g.hw, g.z))
            return jnp.sum(nb).astype(jnp.float32) * 1e-20
        loop_time(subm, (g.coords, g.mask),
                  name=f"  subm map L{i} (P={g.coords.shape[0]})", n=20)

    for i in range(3):
        gi, cap = grids[i], CAPS[i + 1]

        def down_grid(c, cm, gi=gi, cap=cap):
            og = pu.pillar_downsample_grid(
                pu.PillarGrid(cm[0] + ieps(c), cm[1],
                              gi.hw, gi.z), cap)
            return jnp.sum(og.coords).astype(jnp.float32) * 1e-20
        loop_time(down_grid, (gi.coords, gi.mask),
                  name=f"  down grid L{i}->L{i+1}", n=20)

        go = grids[i + 1]

        def conv_map(c, cm, gi=gi, go=go, w=MAP_WINS[i]):
            nb = pu.pillar_conv_neighbor_map(
                pu.PillarGrid(cm[0] + ieps(c), cm[1],
                              gi.hw, gi.z),
                go, window=w)
            return jnp.sum(nb).astype(jnp.float32) * 1e-20
        loop_time(conv_map, (gi.coords, gi.mask),
                  name=f"  conv map L{i}->L{i+1} (win {MAP_WINS[i]})", n=20)


if __name__ == "__main__":
    main()
