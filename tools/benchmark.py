#!/usr/bin/env python
"""FPS benchmark CLI (reference tools/benchmark.py:26-142 /
test_speed.py:24-80 equivalent): warmup + synchronized wall clock over a
preset's eval forward on synthetic or real data."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("--data-root", default=None,
                    help="bench on real data (default: synthetic)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--device-loop", action="store_true",
                    help="measure per-frame device latency via a "
                         "carry-forced on-device fori_loop (one host "
                         "fetch at the end; excludes the axon relay's "
                         "~30 ms per-dispatch fetch overhead — same "
                         "protocol as the root bench.py)")
    ap.add_argument("--record", default=None, metavar="JSON",
                    help="append {preset: {ms, fps, protocol, date}} to "
                         "this JSON file (tools/report_perf.py "
                         "regenerates the PERF.md tables from it)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cmtcoop_tpu.configs.presets import get_preset
    from cmtcoop_tpu.data import formats
    from cmtcoop_tpu.data.synthetic import synthetic_sample
    from cmtcoop_tpu.models.build import build_detector
    from cmtcoop_tpu.utils.profiling import time_fn

    import numpy as np

    preset = get_preset(args.preset)
    dtype = dict(bfloat16=jnp.bfloat16, float32=jnp.float32)[args.dtype]
    model = build_detector(preset, train=False, dtype=dtype)

    if args.data_root:
        from cmtcoop_tpu.data.loader import build_test_loader
        ds, _ = build_test_loader(preset, args.data_root)
        batch = formats.collate([ds[0]])
    else:
        batch = formats.collate(
            [synthetic_sample(preset, np.random.default_rng(0),
                              with_gt=False)])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    from cmtcoop_tpu.models.pillar_encoder import prepare_variables
    variables = prepare_variables(model, variables)

    if args.device_loop:
        import time

        @jax.jit
        def fwd_sum(variables, batch):
            (task_outs, _), _ = model.apply(
                variables, batch, mutable=["batch_stats"])
            return sum(jnp.sum(v.astype(jnp.float32))
                       for t in task_outs for v in t.values())

        # carry-forced frame chain: each frame's inputs depend on the
        # previous frame's output, so frames cannot overlap — per-frame
        # latency with ONE host fetch (protocol identical to bench.py)
        @jax.jit
        def forward_n(variables, batch, n):
            def body(i, c):
                b = {k: v + (c * 1e-30).astype(v.dtype)
                     if jnp.issubdtype(v.dtype, jnp.floating) else v
                     for k, v in batch.items()}
                return c + fwd_sum(variables, b)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(forward_n(variables, batch, 1))          # compile
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
        float(forward_n(variables, batch, args.iters))
        dt = (time.time() - t0 - fetch) / args.iters
        print(f"{preset.name}: {dt * 1e3:.1f} ms/frame device latency")
        print(f"FPS: {1.0 / dt:.2f}")
        if args.record:
            _record(args.record, preset.name, dt, "device-loop")
        return

    @jax.jit
    def forward(variables, batch):
        (task_outs, _), _ = model.apply(
            variables, batch, mutable=["batch_stats"])
        return task_outs
    stats = time_fn(forward, variables, batch, warmup=args.warmup,
                    iters=args.iters, name=preset.name)
    print(f"FPS: {stats['fps']:.2f}")
    if args.record:
        _record(args.record, preset.name, stats["per_iter_s"],
                "per-dispatch")


def _record(path, name, dt, protocol):
    import datetime
    import json
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[name] = {
        "ms": round(dt * 1e3, 1),
        "fps": round(1.0 / dt, 2),
        "protocol": protocol,
        "date": datetime.date.today().isoformat(),
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(f"recorded -> {path}")


if __name__ == "__main__":
    main()
