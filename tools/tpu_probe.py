#!/usr/bin/env python
"""Consolidated TPU component probe (replaces the r2 one-off probe
scripts). Loop-amortized timings at bench shapes: each op runs N times
inside ONE jit with a carry dependence (XLA cannot CSE/reorder), one host
fetch at the end — the axon relay's ~30 ms per-fetch overhead is measured
and subtracted. Appends to runs/tpu_probe.log.

    python tools/tpu_probe.py --what camera     # VoVNet/CPFPN stages
    python tools/tpu_probe.py --what lidar      # pillarize/encoder/SECOND
    python tools/tpu_probe.py --what decoder    # build_memory + decoder
    python tools/tpu_probe.py --what full       # whole coop forward
"""
import argparse
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

_LOG = None


def log(msg):
    global _LOG
    if _LOG is None:
        runs = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "runs")
        os.makedirs(runs, exist_ok=True)
        _LOG = open(os.path.join(runs, "tpu_probe.log"), "a", 1)
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    _LOG.write(line + "\n")


_FETCH = None


def fetch_overhead():
    """Fixed per-fetch relay cost (median of 10 tiny fetches)."""
    global _FETCH
    if _FETCH is None:
        tiny = jax.jit(lambda x: x * 1.0)
        xs = jnp.ones((8, 128))
        float(jnp.sum(tiny(xs)))
        ts = []
        for _ in range(10):
            t0 = time.time()
            float(jnp.sum(tiny(xs)))
            ts.append(time.time() - t0)
        _FETCH = float(np.median(ts))
        log(f"relay fetch overhead: {_FETCH * 1e3:.0f} ms")
    return _FETCH


def loop_time(make_fn, *args, name="", n=20, min_loop_s=1.5, reps=3):
    """make_fn(c, *args) -> scalar float32; c is the carry (forces
    sequential execution of the n applications).

    Noise control: the relay fetch overhead is ~30-40 ms with several ms
    of jitter, so the loop body count is auto-scaled until one timed loop
    runs >= `min_loop_s`; the per-op time is the min over `reps` runs.
    (The r3 first-cut probe ran 30x0.2 ms loops — pure fetch jitter.)"""
    def make_run(nn_):
        @jax.jit
        def run(*a):
            def body(i, c):
                return c + make_fn(c, *a)
            return jax.lax.fori_loop(0, nn_, body, jnp.float32(0))
        return run

    run = make_run(n)
    t0 = time.time()
    float(run(*args))
    first = time.time() - t0
    t0 = time.time()
    float(run(*args))
    per0 = (time.time() - t0 - fetch_overhead()) / n
    if per0 * n < min_loop_s:
        n = max(n, int(min_loop_s / max(per0, 1e-5)) + 1)
        run = make_run(n)
        t0 = time.time()
        float(run(*args))
        first = time.time() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        float(run(*args))
        best = min(best, time.time() - t0)
    per = (best - fetch_overhead()) / n * 1e3
    log(f"{name}: {per:.3f} ms/op (n={n}, compile+first {first:.1f}s)")
    return per


def bench_cloud(seed=0, n_points=65536):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _raycast_cloud
    rng = np.random.default_rng(seed)
    xyz = _raycast_cloud(rng)
    pts = np.zeros((n_points, 5), np.float32)
    k = min(len(xyz), n_points)
    pts[:k, :3] = xyz[:k]
    pts[:k, 3] = rng.uniform(0, 1, k)
    mask = np.zeros(n_points, bool)
    mask[:k] = True
    return jnp.asarray(pts), jnp.asarray(mask)


def probe_camera(dtype=jnp.bfloat16, views=4, hw=(640, 1600)):
    from cmtcoop_tpu.models.vovnet import CPFPN, VoVNet
    rng = np.random.default_rng(0)
    h, w = hw
    x = jnp.asarray(rng.normal(size=(views, h, w, 3))
                    .astype(np.float32)).astype(dtype)
    net = VoVNet("V-99-eSE", ("stage4", "stage5"), dtype=dtype)
    params = jax.jit(lambda k, x_: net.init(k, x_, False))(
        jax.random.PRNGKey(0), x)

    def full(c, pr, x_):
        outs = net.apply(pr, x_ + c.astype(dtype) * 0, False)
        return sum(o.astype(jnp.float32).sum() * 1e-20
                   for o in outs.values())
    loop_time(full, params, x, name=f"VoVNet-99 {views}x{h}x{w}", n=10)

    # per-stage: run the backbone's submodules incrementally
    feats = net.apply(params, x, False)
    neck = CPFPN(256, num_outs=2, dtype=dtype)
    nparams = jax.jit(lambda k, f: neck.init(k, f, False))(
        jax.random.PRNGKey(0), [feats["stage4"], feats["stage5"]])

    def neck_fn(c, pr, f4, f5):
        outs = neck.apply(pr, [f4 + c.astype(dtype) * 0, f5], False)
        return sum(o.astype(jnp.float32).sum() * 1e-20 for o in outs)
    loop_time(neck_fn, nparams, feats["stage4"], feats["stage5"],
              name="CPFPN", n=20)


def probe_lidar(dtype=jnp.bfloat16, max_pillars=49152,
                pillar_caps=(38400, 40960, 24064, 11264)):
    from cmtcoop_tpu.models.pillar_encoder import PillarSparseEncoder
    from cmtcoop_tpu.models.second import SECOND, SECONDFPN
    from cmtcoop_tpu.ops.pillars import pillarize

    pts, mask = bench_cloud()
    kw = dict(voxel_size=(0.1, 0.1, 0.2),
              pc_range=(-72.0, -72.0, -8.0, 72.0, 72.0, 0.0),
              grid_size=(1440, 1440, 40), max_points=10,
              max_voxels=65536, max_pillars=max_pillars)

    def pz(c, p, m):
        pc, pm, occ, feats = pillarize(p + c * 0, m, **kw)
        return (feats.sum() * 1e-20 + pc.sum().astype(jnp.float32)
                + occ.sum().astype(jnp.float32)) * 1e-20
    loop_time(pz, pts, mask, name=f"pillarize cap={max_pillars}", n=10)

    enc = PillarSparseEncoder(
        sparse_shape=(41, 1440, 1440), base_channels=16,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        output_channels=128, pillar_caps=tuple(pillar_caps), dtype=dtype)
    prebuilt = jax.tree.map(
        lambda x: x[None], jax.jit(
            lambda p, m: pillarize(p, m, **kw))(pts, mask))
    params = jax.jit(lambda k, pb: enc.init(
        k, None, None, None, False, prebuilt=pb))(
        jax.random.PRNGKey(0), prebuilt)

    def enc_fn(c, pr, pb):
        pb = jax.tree.map(
            lambda x: (x + c.astype(x.dtype) * 0
                       if jnp.issubdtype(x.dtype, jnp.floating) else x),
            pb)
        bev = enc.apply(pr, None, None, None, False, prebuilt=pb)
        return bev.astype(jnp.float32).sum() * 1e-20
    loop_time(enc_fn, params, prebuilt,
              name=f"pillar encoder caps={tuple(pillar_caps)}", n=10)

    bev = jax.jit(lambda pb: enc.apply(
        params, None, None, None, False, prebuilt=pb))(prebuilt)
    second = SECOND((128, 256), (5, 5), dtype=dtype)
    sp = jax.jit(lambda k, b: second.init(k, b, False))(
        jax.random.PRNGKey(0), bev)
    fpn = SECONDFPN((256, 256), dtype=dtype)
    souts = jax.jit(lambda b: second.apply(sp, b, False))(bev)
    fp = jax.jit(lambda k, s: fpn.init(k, s, False))(
        jax.random.PRNGKey(0), souts)

    def sf(c, sp_, fp_, b):
        outs = second.apply(sp_, b + c.astype(dtype) * 0, False)
        o = fpn.apply(fp_, outs, False)
        return o.astype(jnp.float32).sum() * 1e-20
    loop_time(sf, sp, fp, bev, name="SECOND+FPN", n=20)


def probe_decoder(dtype=jnp.bfloat16):
    from cmtcoop_tpu.models.cmt_head import AgentInputs, CmtHead
    rng = np.random.default_rng(0)
    head = CmtHead(train_mode=False, dtype=dtype)
    bev_feat = jnp.asarray(rng.normal(size=(1, 180, 180, 512))
                           .astype(np.float32)).astype(dtype)
    l2i = np.tile(np.eye(4, dtype=np.float32), (1, 4, 1, 1))
    l2i[..., :3, 3] = rng.normal(size=(1, 4, 3))
    img_feats = jnp.asarray(rng.normal(size=(1, 4, 40, 100, 256))
                            .astype(np.float32)).astype(dtype)
    agent = AgentInputs(bev_feat, img_feats, jnp.asarray(l2i),
                        jnp.asarray(np.linalg.inv(l2i)), (640, 1600))
    params = jax.jit(lambda k: head.init(
        {"params": k}, [agent]))(jax.random.PRNGKey(0))

    def mem_fn(c, pr, ag):
        ag = AgentInputs(ag.bev_feat + c.astype(dtype) * 0, ag.img_feats,
                         ag.lidar2img, ag.img2lidar, ag.pad_hw)
        mem, pos = head.apply(pr, ag, 1, method=CmtHead.build_memory)
        return (mem.astype(jnp.float32).sum()
                + pos.astype(jnp.float32).sum()) * 1e-20
    loop_time(mem_fn, params, agent, name="build_memory", n=10)

    mem = jnp.asarray(rng.normal(size=(1, 44400, 256))
                      .astype(np.float32)).astype(dtype)
    pos = jnp.asarray(rng.normal(size=(1, 44400, 256))
                      .astype(np.float32)).astype(dtype)
    q = jnp.asarray(rng.normal(size=(1, 900, 256))
                    .astype(np.float32)).astype(dtype)

    def dec_fn(c, pr, m, p, q_):
        o = head.apply(pr, m + c.astype(dtype) * 0, p, q_, 1,
                       method=CmtHead.run_decoder)
        return o.astype(jnp.float32).sum() * 1e-20
    loop_time(dec_fn, params, mem, pos, q,
              name="decoder 6L x 44.4k KV", n=10)


def probe_full(dtype=jnp.bfloat16):
    from __graft_entry__ import entry
    fn, (variables, batch) = entry()
    jfn = jax.jit(fn)

    def full(c, v, b):
        b = {k: x + (c * 0).astype(x.dtype)
             if jnp.issubdtype(x.dtype, jnp.floating) else x
             for k, x in b.items()}
        outs = fn(v, b)
        return sum(x.astype(jnp.float32).sum() * 1e-20
                   for t in outs for x in t.values())
    loop_time(full, variables, batch, name="full coop forward", n=10)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="full",
                    choices=["camera", "lidar", "decoder", "full", "all"])
    args = ap.parse_args()
    log(f"==== tpu_probe --what {args.what} ====")
    fetch_overhead()
    what = (("camera", "lidar", "decoder", "full")
            if args.what == "all" else (args.what,))
    for w in what:
        globals()[f"probe_{w}"]()


if __name__ == "__main__":
    main()
