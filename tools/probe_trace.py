#!/usr/bin/env python
"""Device-trace the flagship bench forward and attribute time by source
line / op category (jax.profiler xplane -> trace.json.gz -> aggregate).
Appends a summary to runs/tpu_probe.log.

Usage: python tools/probe_trace.py [--modality fusion] [--top 40]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.tpu_probe import log  # noqa: E402

TRACE_DIR = "/tmp/bench_trace"


def build_forward(modality):
    from cmtcoop_tpu.models.detector import CmtCoopDetector
    from __graft_entry__ import _coop_batch

    model = CmtCoopDetector(
        use_lidar=modality in ("fusion", "lidar"),
        use_camera=modality in ("fusion", "camera"),
        extractor_kwargs=dict(
            max_voxels=65536,
            pillar_caps=(38400, 40960, 24064, 11264)),
        head_kwargs=dict(max_gt=128),
        dtype=jnp.bfloat16)
    batch = _coop_batch(batch_size=1, n_points=65536, veh_views=1,
                        infra_views=3, img_hw=(640, 1600))
    if modality == "lidar":
        batch = {k: v for k, v in batch.items() if "img" not in k}
    if modality == "camera":
        batch = {k: v for k, v in batch.items() if "points" not in k}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    @jax.jit
    def forward(variables, batch):
        (task_outs, _), _ = model.apply(
            variables, batch, mutable=["batch_stats"])
        return sum(jnp.sum(v.astype(jnp.float32))
                   for t in task_outs for v in t.values())

    return forward, variables, batch


def aggregate(iters):
    """SELF-time per (category, source): nested events (cond/branch/while
    wrappers contain their bodies on the XLA Ops lane) would otherwise be
    double-counted — the raw lane sum exceeded the true module duration
    by 40%+ on the first capture."""
    files = glob.glob(os.path.join(
        TRACE_DIR, "plugins/profile/*/**trace.json.gz"), recursive=True)
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    ops = []
    module_us = 0
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        lane = tids.get((e["pid"], e["tid"]), "")
        if e["name"].startswith("jit_"):
            if lane == "XLA Modules":
                module_us += e.get("dur", 0)
            continue
        if lane == "XLA Ops":
            ops.append(e)
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))
    stack = []
    by_src = collections.Counter()
    by_cat = collections.Counter()
    for e in ops:
        ts, d = e["ts"], e.get("dur", 0)
        while stack and ts >= stack[-1][0] + stack[-1][1] - 1e-9:
            stack.pop()
        src = str(e.get("args", {}).get("source", "")).replace(
            "/root/repo/", "")
        cat = re.sub(r"[.\d]+$", "", e["name"])
        key = (cat, src or f"<{cat}>")
        if stack:
            by_src[stack[-1][2][1]] -= d
            by_cat[stack[-1][2][0]] -= d
        by_src[key[1]] += d
        by_cat[key[0]] += d
        stack.append((ts, d, key))
    return by_src, by_cat, len(ops), module_us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modality", default="fusion")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    log(f"==== probe_trace ({args.modality}) ====")
    forward, variables, batch = build_forward(args.modality)
    v = float(forward(variables, batch))  # compile + warm
    float(forward(variables, batch))
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(args.iters):
        v = float(forward(variables, batch))
    jax.profiler.stop_trace()
    log(f"  traced {args.iters} iters (out={v:.3e})")

    by_src, by_cat, n_ev, module_us = aggregate(args.iters)
    tot = sum(by_cat.values())
    log(f"  device module {module_us / args.iters / 1e3:.2f} ms/iter, "
        f"op self-time sum {tot / args.iters / 1e3:.2f} "
        f"({n_ev // args.iters} events)")
    log("  -- by hlo category --")
    for cat, d in by_cat.most_common(12):
        log(f"   {d / args.iters / 1e3:8.3f} ms  {cat}")
    log("  -- by source line --")
    for src, d in by_src.most_common(args.top):
        log(f"   {d / args.iters / 1e3:8.3f} ms  {src}")


if __name__ == "__main__":
    main()
