#!/usr/bin/env python
"""Flagship-shape TRAIN step on the real TPU: compile, memory-profile,
and time one coop-fusion train step (b1, DN on, remat on, attn dropout
0.1 through the in-kernel flash path, bf16 compute).

The reference trains these shapes in 7-22 GB on A100s (README.md:201-206);
this records our step latency and XLA's memory analysis (peak temp +
arguments) so PERF.md can carry a measured number instead of a claim.
Appends to runs/tpu_probe.log.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.tpu_probe import log  # noqa: E402


def main():
    from __graft_entry__ import _coop_batch, _shape_only_init
    from cmtcoop_tpu.models.detector import CmtCoopDetector
    from cmtcoop_tpu.parallel.train_step import (TrainState,
                                                 make_train_step)
    from cmtcoop_tpu.train.optim import make_optimizer

    n_points = int(os.environ.get("CMTCOOP_TRAIN_POINTS", "65536"))
    log(f"==== probe_train_step: flagship coop-fusion train step "
        f"(b1, {n_points} pts, DN on, remat on, bf16) ====")
    model = CmtCoopDetector(
        use_lidar=True, use_camera=True,
        extractor_kwargs=dict(
            max_voxels=65536,
            pillar_caps=(38400, 40960, 24064, 11264)),
        head_kwargs=dict(max_gt=128),
        dtype=jnp.bfloat16,
        train_mode=True,
    )
    from cmtcoop_tpu.models.cmt_head import CmtHead
    tasks = CmtHead.tasks
    batch = _coop_batch(
        batch_size=1, n_points=n_points, veh_views=1, infra_views=3,
        img_hw=(640, 1600), max_gt=128)
    rngs = {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
            "gridmask": jax.random.PRNGKey(3)}
    t0 = time.time()
    variables = _shape_only_init(model, rngs, batch)
    log(f"  shape-only init: {time.time() - t0:.1f}s")
    tx, _ = make_optimizer(variables["params"], total_steps=100)
    state = TrainState(
        jnp.zeros((), jnp.int32), variables["params"],
        variables.get("batch_stats", {}), tx.init(variables["params"]))
    # donate the state: without aliasing, old state (2.05 GB) + new state
    # stay live across the step — measured runtime OOM at 15.84 GB peak
    # (this log, 01:03) even though the compile-time analysis fit
    step = make_train_step(model, tx, tasks, donate=True)

    t0 = time.time()
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    log(f"  compile: {compile_s:.1f}s")
    peak_gb = None
    try:
        ma = compiled.memory_analysis()
        gb = 1024 ** 3
        log(f"  memory analysis: args {ma.argument_size_in_bytes / gb:.2f} "
            f"GB, output {ma.output_size_in_bytes / gb:.2f} GB, "
            f"temp {ma.temp_size_in_bytes / gb:.2f} GB, "
            f"peak(args+temp) "
            f"{(ma.argument_size_in_bytes + ma.temp_size_in_bytes) / gb:.2f}"
            f" GB (chip HBM: 16 GB)")
        peak_gb = (ma.argument_size_in_bytes + ma.temp_size_in_bytes) / gb
    except Exception as e:  # relay may not expose it
        log(f"  memory analysis unavailable: {e}")

    t0 = time.time()
    state, metrics = compiled(state, batch)
    jax.block_until_ready(metrics)
    log(f"  step 1 (incl. transfer): {time.time() - t0:.1f}s "
        f"loss={float(metrics['loss']):.3f}")
    times = []
    for i in range(4):
        t0 = time.time()
        state, metrics = compiled(state, batch)
        # force a host fetch: the axon relay's block_until_ready returns
        # early, so a non-fetching timer measures dispatch, not the step
        float(metrics["loss"])
        times.append(time.time() - t0)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    log(f"  steady train step: {min(times) * 1e3:.1f} ms (min of 4; "
        f"per-dispatch incl. relay) loss={loss:.3f} "
        f"grad_norm={float(metrics['grad_norm']):.3f}")
    tflops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and ca.get("flops"):
            tflops = ca["flops"] / min(times) / 1e12
            log(f"  achieved {tflops:.1f} TFLOP/s "
                f"(XLA cost-analysis flops / step time; v5e bf16 peak "
                f"197)")
    except Exception as e:
        log(f"  cost_analysis unavailable: {e}")
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            log(f"  device memory_stats: peak "
                f"{stats.get('peak_bytes_in_use', 0) / 1024**3:.2f} GB / "
                f"limit {stats.get('bytes_limit', 0) / 1024**3:.2f} GB")
            if stats.get("peak_bytes_in_use"):
                peak_gb = stats["peak_bytes_in_use"] / 1024 ** 3
    except Exception as e:
        log(f"  memory_stats unavailable: {e}")

    # machine-readable record for tools/report_perf.py
    import datetime
    import json
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runs", "train_step.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["coop_fusion_b1_dn_remat_bf16"] = {
        "step_ms": round(min(times) * 1e3, 1),
        "peak_hbm_gb": None if peak_gb is None else round(peak_gb, 2),
        "compile_s": round(compile_s, 1),
        "loss": round(loss, 3),
        "tflops": None if tflops is None else round(tflops, 1),
        "date": datetime.date.today().isoformat(),
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    log(f"  recorded -> {path}")


if __name__ == "__main__":
    main()
