#!/usr/bin/env python
"""Measure per-dy-group window spans of the subm neighbor maps at bench
shapes, for kernel block sizes bp=128/256 — sizes `subm_wins` (the fused
kernel's outer-row windows, ops/pillar_fused.py::window_plan). CPU-only.

Span per block = max(valid tap) - (min(valid tap) // 8 * 8) + 1, i.e. the
smallest window that holds the block's dy-group taps after the kernel's
8-aligned clamp. Reports p99/p100 over blocks for dy=-1 and dy=+1 groups.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_probe import bench_cloud, log

import cmtcoop_tpu.ops.pillars as pu
from cmtcoop_tpu.ops.pillars import pillarize

CAPS = (38400, 40960, 24064, 11264)
KW = dict(voxel_size=(0.1, 0.1, 0.2),
          pc_range=(-72.0, -72.0, -8.0, 72.0, 72.0, 0.0),
          grid_size=(1440, 1440, 40), max_points=10,
          max_voxels=65536, max_pillars=CAPS[0])


def spans(nbr, p_in, bp):
    """p99/p100 window need per dy group at block size bp."""
    nbr = np.asarray(nbr)
    p_out = nbr.shape[0]
    nb = p_out // bp
    nblk = nbr[:nb * bp].reshape(nb, bp, 9)
    out = {}
    for gname, taps in (("dy-1", [0, 1, 2]), ("dy+1", [6, 7, 8])):
        v = nblk[:, :, taps]
        valid = v < p_in
        gmin = np.where(valid, v, p_in).min(axis=(1, 2))
        gmax = np.where(valid, v, -1).max(axis=(1, 2))
        has = gmax >= 0
        need = gmax - (gmin // 8 * 8) + 1
        need = need[has]
        out[gname] = (int(np.percentile(need, 99)) if need.size else 0,
                      int(need.max()) if need.size else 0)
    return out


def main():
    log(f"==== probe_spans (bench cloud, caps {CAPS}) ====")
    pts, mask = bench_cloud()
    pcoords, pmask, occ, _ = jax.jit(
        lambda p, m: pillarize(p, m, **KW))(pts, mask)
    grid = pu.PillarGrid(pcoords, pmask, (1440, 1440), 41)

    for lvl in range(4):
        nbr = pu.pillar_neighbor_map(grid)
        p_in = grid.coords.shape[0]
        occn = int(np.asarray(grid.mask).sum())
        for bp in (128, 256):
            s = spans(nbr, p_in, bp)
            log(f"  L{lvl} P={p_in} occ={occn} bp={bp}: "
                f"dy-1 p99/p100={s['dy-1']} dy+1 p99/p100={s['dy+1']}")
        if lvl < 3:
            og = pu.pillar_downsample_grid(grid, CAPS[lvl + 1])
            oh = (grid.hw[0] + 2 - 3) // 2 + 1
            ow = (grid.hw[1] + 2 - 3) // 2 + 1
            grid = pu.PillarGrid(og.coords, og.mask, (oh, ow), grid.z)


if __name__ == "__main__":
    main()
