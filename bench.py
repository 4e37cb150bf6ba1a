"""Benchmark: flagship CMTCoop multimodal batch-1 inference FPS on TPU.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's headline FPS for CMT fusion
(voxel0075_vov_1600x640, A100, README.md:256) = 6.4 FPS; the BASELINE.json
north star asks for >=2x that on a single v5e chip for the *cooperative*
multimodal model (two agents = roughly twice the work of the A100 row).
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

import jax

# persistent XLA compile cache: the driver runs bench.py in a fresh process
# every round; an unchanged model then skips the multi-minute first compile.
# NOTE: this jax build ignores the JAX_COMPILATION_CACHE_DIR env var — the
# explicit config.update is required (verified empirically).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--modality", default="fusion",
                    choices=["fusion", "lidar", "camera"])
    args = ap.parse_args()

    import jax.numpy as jnp
    from cmtcoop_tpu.models.detector import CmtCoopDetector
    from __graft_entry__ import _coop_batch

    dtype = dict(bfloat16=jnp.bfloat16, float32=jnp.float32)[args.dtype]
    use_lidar = args.modality in ("fusion", "lidar")
    use_camera = args.modality in ("fusion", "camera")
    # caps sized to real TUMTraf occupancy (Ouster-64 + RoboSense ~60-70k
    # points/frame after range crop -> <=50k occupied voxels/pillars);
    # static shapes mean padded caps, not occupancy, set the cost
    # mid-level caps must EXCEED L0: a k3/s2 sparse conv dilates BEV
    # occupancy (measured on the bench clouds: 31k -> 36.8k -> 21.4k ->
    # 9.9k); the per-level assert below keeps these honest
    pillar_caps = (38400, 40960, 24064, 11264)
    model = CmtCoopDetector(
        use_lidar=use_lidar, use_camera=use_camera,
        extractor_kwargs=dict(
            max_voxels=65536,
            pillar_caps=pillar_caps),
        head_kwargs=dict(max_gt=128),
        dtype=dtype,
    )
    batch = _coop_batch(
        batch_size=1, n_points=args.points, veh_views=1, infra_views=3,
        img_hw=(640, 1600))
    if not use_camera:
        batch = {k: v for k, v in batch.items() if "img" not in k}
    if not use_lidar:
        batch = {k: v for k, v in batch.items() if "points" not in k}

    if use_lidar and os.environ.get("CMTCOOP_SKIP_CAPSTATS", "0") != "1":
        # pillar-cap telemetry: the headline FPS is only honest if the
        # caps do not truncate the bench clouds (round-2 VERDICT weak #3:
        # the old synthetic generator silently overflowed them).
        # CMTCOOP_SKIP_CAPSTATS=1 skips the extra compile during
        # same-inputs A/B iteration (the driver never sets it)
        from cmtcoop_tpu.ops import pillars as pu
        from cmtcoop_tpu.ops.pillars import pillarize

        def stats(p, m):
            pc, pm, _, _, s = pillarize(
                p, m, voxel_size=(0.1, 0.1, 0.2),
                pc_range=(-72.0, -72.0, -8.0, 72.0, 72.0, 0.0),
                grid_size=(1440, 1440, 40), max_points=10,
                max_voxels=65536, max_pillars=pillar_caps[0],
                return_stats=True)
            # true (uncapped) occupancy of every downsample level: a k3/s2
            # conv dilates occupancy, so each level needs its own check
            g = pu.PillarGrid(pc, pm, (1440, 1440), 41)
            level_n = []
            for cap in pillar_caps[1:]:
                g, n = pu.pillar_downsample_grid(g, cap, return_n=True)
                level_n.append(n)
            return s, jnp.stack(level_n)

        stats_fn = jax.jit(stats)
        for agent in ("vehicle_", "infrastructure_"):
            s, level_n = jax.device_get(
                stats_fn(batch[agent + "points"][0],
                         batch[agent + "points_mask"][0]))
            occs = " ".join(
                f"L{i+1}={int(n)}/{c}" for i, (n, c) in enumerate(
                    zip(level_n, pillar_caps[1:])))
            print(f"# {agent}cloud: {int(s['n_points_in_range'])} pts, "
                  f"{int(s['n_pillars_raw'])} pillars "
                  f"({int(s['n_pillars_dropped'])} dropped), "
                  f"{int(s['n_voxels_raw'])} voxels "
                  f"({int(s['n_voxels_dropped'])} dropped), {occs}",
                  file=sys.stderr, flush=True)
            assert int(s["n_pillars_dropped"]) == 0, \
                "bench cloud overflows the pillar cap — headline invalid"
            assert int(s["n_voxels_dropped"]) == 0, \
                "bench cloud overflows the voxel cap — headline invalid"
            for i, (n, c) in enumerate(zip(level_n, pillar_caps[1:])):
                assert int(n) <= c, (
                    f"level {i+1} occupancy {int(n)} overflows cap {c} — "
                    "headline invalid (silent mid-level truncation)")

    # NOTE: shape-only init (dryrun-style) was measured SLOWER here —
    # tracing the bench-scale graph locally + shipping ~600 MB of leaves
    # through the axon relay costs more than the remote init compile
    t0 = time.time()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(variables)
    print(f"# init: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    if use_lidar and os.environ.get("CMTCOOP_PREPARE", "1") != "0":
        # hoist frame-invariant pillar band matrices out of the jitted
        # forward (models/pillar_encoder.py::prepare_variables);
        # CMTCOOP_PREPARE=0 A/Bs the in-jit band build
        from cmtcoop_tpu.models.pillar_encoder import prepare_variables
        t0 = time.time()
        variables = prepare_variables(model, variables)
        jax.block_until_ready(variables.get("prepared", ()))
        print(f"# prepare: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
    else:
        # echo the A/B state so saved bench outputs are attributable
        print("# prepare: skipped (CMTCOOP_PREPARE=0 or no lidar — "
              "in-jit band build)", file=sys.stderr, flush=True)

    @jax.jit
    def forward(variables, batch):
        (task_outs, _), _ = model.apply(
            variables, batch, mutable=["batch_stats"])
        # reduce to a scalar so timing can force a host fetch —
        # block_until_ready through the axon relay does not actually block
        return sum(
            jnp.sum(v.astype(jnp.float32))
            for t in task_outs for v in t.values())

    # Latency measurement. The axon relay adds a fixed ~31 ms host-fetch
    # to every dispatched call — tunnel overhead, not device time (absent
    # on a local TPU host). So frames run device-side in a carry-forced
    # fori_loop (each frame's input depends on the previous frame's
    # output, so frames CANNOT overlap — this is per-frame latency, not
    # pipelined throughput), with ONE host fetch at the end, mirroring
    # the reference's cuda-synchronized wall-clock loop (benchmark.py:
    # 109-138). The per-dispatch number is printed as a diagnostic.
    # n is a RUNTIME argument: one compile serves both the per-dispatch
    # (n=1) and loop measurements — the static-n version compiled the
    # whole model a second (and third) time, which blew the bench budget
    # once the backbone gained ~100 Pallas kernels. The carry perturbs
    # inputs by c * 1e-30 (not c * 0, which the algebraic simplifier may
    # fold, unhooking the loop-carry dependence).
    @jax.jit
    def forward_n(variables, batch, n):
        def body(i, c):
            # every input leaf depends on the carry, so NO part of the
            # frame is loop-invariant or overlappable with the next
            b = {
                k: v + (c * 1e-30).astype(v.dtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v
                for k, v in batch.items()
            }
            return c + forward(variables, b)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    t0 = time.time()
    float(forward_n(variables, batch, 1))
    print(f"# first forward (compile): {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)


    # relay fetch overhead: the fixed cost of any host-fetched call
    tiny = jax.jit(lambda x: x * 1.0)
    xs = jnp.ones((8, 128))
    float(jnp.sum(tiny(xs)))
    t0 = time.time()
    for _ in range(10):
        float(jnp.sum(tiny(xs)))
    fetch = (time.time() - t0) / 10

    for _ in range(args.warmup):
        float(forward_n(variables, batch, 1))
    t0 = time.time()
    for _ in range(args.iters):
        float(forward_n(variables, batch, 1))
    per_dispatch = (time.time() - t0) / args.iters
    t0 = time.time()
    float(forward_n(variables, batch, args.iters))
    dt = (time.time() - t0 - fetch) / args.iters
    fps = 1.0 / dt
    print(f"# per-dispatch (incl. ~{fetch * 1e3:.0f} ms relay fetch): "
          f"{per_dispatch * 1e3:.1f} ms = {1.0 / per_dispatch:.2f} fps",
          file=sys.stderr, flush=True)

    baseline_fps = 6.4  # reference A100 CMT fusion val FPS (README.md:256)
    print(json.dumps({
        "metric": f"cmtcoop_{args.modality}_b1_fps_v5e",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
