#!/usr/bin/env python
"""Run the per-preset FPS matrix in ONE process (the axon relay charges
~60-90 s of backend warmup to every fresh process; 9 presets in-process
pay it once). Device-loop protocol identical to tools/benchmark.py
--device-loop / the root bench.py; results append to
runs/preset_matrix.json for tools/report_perf.py.

    python tools/benchmark_matrix.py [preset ...]   (default: 9 TUMTraf)
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

DEFAULT = [f"cmt_{m}_{d}_tumtraf"
           for d in ("vehicle", "infrastructure", "coop")
           for m in ("camera", "lidar", "fusion")]


def run_one(name, fetch):
    import numpy as np
    import jax.numpy as jnp
    from cmtcoop_tpu.configs.presets import get_preset
    from cmtcoop_tpu.data import formats
    from cmtcoop_tpu.data.synthetic import synthetic_sample
    from cmtcoop_tpu.models.build import build_detector
    from cmtcoop_tpu.models.pillar_encoder import prepare_variables

    preset = get_preset(name)
    model = build_detector(preset, train=False, dtype=jnp.bfloat16)
    batch = formats.collate(
        [synthetic_sample(preset, np.random.default_rng(0),
                          with_gt=False)])
    t0 = time.time()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(variables)
    print(f"#   init {time.time() - t0:.0f}s", flush=True)
    if preset.use_lidar:
        variables = prepare_variables(model, variables)

    @jax.jit
    def fwd_sum(variables, batch):
        (task_outs, _), _ = model.apply(
            variables, batch, mutable=["batch_stats"])
        return sum(jnp.sum(v.astype(jnp.float32))
                   for t in task_outs for v in t.values())

    @jax.jit
    def forward_n(variables, batch, n):
        def body(i, c):
            b = {k: v + (c * 1e-30).astype(v.dtype)
                 if jnp.issubdtype(v.dtype, jnp.floating) else v
                 for k, v in batch.items()}
            return c + fwd_sum(variables, b)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    t0 = time.time()
    float(forward_n(variables, batch, 1))
    print(f"#   compile {time.time() - t0:.0f}s", flush=True)
    for _ in range(3):
        float(forward_n(variables, batch, 1))
    iters = 20
    t0 = time.time()
    float(forward_n(variables, batch, iters))
    dt = (time.time() - t0 - fetch) / iters
    return dt


def main():
    names = sys.argv[1:] or DEFAULT
    import datetime
    import jax.numpy as jnp

    # relay fetch overhead (fixed per host-fetched call)
    tiny = jax.jit(lambda x: x * 1.0)
    xs = jnp.ones((8, 128))
    float(jnp.sum(tiny(xs)))
    t0 = time.time()
    for _ in range(10):
        float(jnp.sum(tiny(xs)))
    fetch = (time.time() - t0) / 10
    print(f"# relay fetch {fetch * 1e3:.0f} ms", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runs", "preset_matrix.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    for name in names:
        print(f"# {name} ...", flush=True)
        try:
            dt = run_one(name, fetch)
        except Exception:
            traceback.print_exc()
            print(f"# {name} FAILED", flush=True)
            continue
        data[name] = {
            "ms": round(dt * 1e3, 1),
            "fps": round(1.0 / dt, 2),
            "protocol": "device-loop",
            "date": datetime.date.today().isoformat(),
        }
        with open(path, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        print(f"{name}: {dt * 1e3:.1f} ms = {1.0 / dt:.2f} fps "
              f"(recorded)", flush=True)


if __name__ == "__main__":
    main()
