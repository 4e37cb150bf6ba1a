#!/usr/bin/env python
"""A/B the coop pillar-encoder paths at bench shapes: two per-agent
module chains vs the agent-batched kernel chain
(models/pillar_encoder.py::pillar_encoder_coop). Both get prepared band
matrices. Appends to runs/tpu_probe.log.
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
    from cmtcoop_tpu.models.pillar_encoder import (
        PillarSparseEncoder, _encoder_bands, pillar_encoder_coop)
    from cmtcoop_tpu.ops.pillars import pillarize

    log("==== probe_coop_batched: per-agent module x2 vs agent-batched ====")
    fetch_overhead()
    pts_v, mask_v = bench_cloud(seed=0)
    pts_i, mask_i = bench_cloud(seed=1)
    enc = PillarSparseEncoder(
        sparse_shape=(41, 1440, 1440), base_channels=16,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        output_channels=128, pillar_caps=CAPS, dtype=DT)
    pb0 = jax.tree.map(
        lambda x: x[None],
        jax.jit(lambda p, m: pillarize(p, m, **KW))(pts_v, mask_v))
    params = jax.jit(lambda k, pb: enc.init(
        k, None, None, None, False, prebuilt=pb))(
        jax.random.PRNGKey(0), pb0)
    cin0 = params["params"]["conv_input"]["conv"]["kernel"].shape[1]
    prep = jax.jit(lambda p, s: _encoder_bands(
        enc.clone(parent=None), p, s, cin0))(
        params["params"], params["batch_stats"])
    var1 = dict(params, prepared=prep)

    # --- per-agent module path (pillarize + encoder, x2 agents) ---
    def f_module(c, pv, mv, pi, mi, vr):
        outs = []
        for p, m in ((pv, mv), (pi, mi)):
            p = p + (c * 1e-30).astype(p.dtype)
            pb = jax.tree.map(
                lambda x: x[None], pillarize(p, m, **KW))
            outs.append(enc.apply(vr, None, None, None, False,
                                  prebuilt=pb))
        return sum(o.astype(jnp.float32).sum() for o in outs) * 1e-20

    loop_time(f_module, pts_v, mask_v, pts_i, mask_i, var1,
              name="  module x2 (pillarize+enc)", n=10)

    # --- agent-batched path (stacked pillarize + one kernel chain) ---
    def f_batched(c, pv, mv, pi, mi, vr):
        pts = jnp.stack([pv + (c * 1e-30).astype(pv.dtype), pi])
        msk = jnp.stack([mv, mi])
        prebuilt = jax.lax.map(
            lambda pm: pillarize(pm[0], pm[1], **KW), (pts, msk))
        dense = pillar_encoder_coop([vr, vr], prebuilt, enc)
        return dense.astype(jnp.float32).sum() * 1e-20

    loop_time(f_batched, pts_v, mask_v, pts_i, mask_i, var1,
              name="  batched (lax.map pillarize + coop chain)", n=10)

    # --- batched, vmapped pillarize instead of lax.map ---
    def f_batched_vmap(c, pv, mv, pi, mi, vr):
        pts = jnp.stack([pv + (c * 1e-30).astype(pv.dtype), pi])
        msk = jnp.stack([mv, mi])
        prebuilt = jax.vmap(
            lambda p, m: pillarize(p, m, **KW))(pts, msk)
        dense = pillar_encoder_coop([vr, vr], prebuilt, enc)
        return dense.astype(jnp.float32).sum() * 1e-20

    loop_time(f_batched_vmap, pts_v, mask_v, pts_i, mask_i, var1,
              name="  batched (vmap pillarize + coop chain)", n=10)


if __name__ == "__main__":
    main()
