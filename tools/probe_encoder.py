#!/usr/bin/env python
"""Cumulative stage breakdown of PillarSparseEncoder at bench caps/shapes
via the module's `debug_stop` early returns (same params, same graph
prefix, so differences are true per-stage costs). Appends to
runs/tpu_probe.log.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.tpu_probe import bench_cloud, fetch_overhead, log, loop_time  # noqa: E402

DT = jnp.bfloat16
CAPS = (38400, 40960, 24064, 11264)
KW = dict(voxel_size=(0.1, 0.1, 0.2),
          pc_range=(-72.0, -72.0, -8.0, 72.0, 72.0, 0.0),
          grid_size=(1440, 1440, 40), max_points=10,
          max_voxels=65536, max_pillars=CAPS[0])


def main():
    from cmtcoop_tpu.models.pillar_encoder import PillarSparseEncoder
    from cmtcoop_tpu.ops.pillars import pillarize

    subm_bp = int(os.environ.get("CMTCOOP_PROBE_SUBM_BP", "128"))
    wins = tuple(int(w) for w in os.environ.get(
        "CMTCOOP_PROBE_SUBM_WINS", "256,256,256,256").split(","))
    log(f"==== probe_encoder cumulative (debug_stop) subm_bp={subm_bp} "
        f"wins={wins} ====")
    fetch_overhead()
    pts, mask = bench_cloud()
    prebuilt = jax.tree.map(
        lambda x: x[None],
        jax.jit(lambda p, m: pillarize(p, m, **KW))(pts, mask))
    enc = PillarSparseEncoder(
        sparse_shape=(41, 1440, 1440), base_channels=16,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        output_channels=128, pillar_caps=CAPS, dtype=DT,
        subm_bp=subm_bp, subm_wins=wins)
    params = jax.jit(lambda k, pb: enc.init(
        k, None, None, None, False, prebuilt=pb))(
        jax.random.PRNGKey(0), prebuilt)

    for stop in ("maps", "input", "s0", "s1", "s2", "s3", "conv_out", ""):
        def f(c, pr, pb, stop=stop):
            pb = (pb[0], pb[1], pb[2],
                  pb[3] + (c * 1e-30).astype(pb[3].dtype))
            out = enc.apply(pr, None, None, None, False, prebuilt=pb,
                            debug_stop=stop)
            return out.astype(jnp.float32).sum() * 1e-20
        loop_time(f, params, prebuilt,
                  name=f"  enc upto {stop or 'FULL'}", n=15)


if __name__ == "__main__":
    main()
