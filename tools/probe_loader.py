#!/usr/bin/env python
"""Host data-loader throughput probe (VERDICT r4 missing #7 / SURVEY §7.3 #7).

Synthesizes a flagship-scale raw archive (60k-point clouds, 1200x1920
JPGs), runs tools/create_data.py on it, then measures samples/s of the
FULL coop train pipeline — PCD-decoded bins, GT-paste dbsampler, joint
RST aug, ida resize to 640x1600, pad/normalize — through PrefetchLoader
at several worker counts. The loader must outrun the train step rate
(and the 9.x FPS eval rate) or the TPU starves.

    python tools/probe_loader.py [--frames 12] [--epochs 2] \
        [--workers 0 2 4 6] [--keep-dir DIR]
"""
import argparse
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=2,
                    help="timed epochs (first epoch is warmup: page cache)")
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 2, 6])
    ap.add_argument("--use-processes", action="store_true",
                    help="fork-pool workers instead of threads")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--keep-dir", default=None,
                    help="reuse/keep the synthesized archive here")
    ap.add_argument("--preset", default="cmt_fusion_coop_tumtraf")
    args = ap.parse_args()

    from cmtcoop_tpu.data.synthetic_archive import build_raw_archive

    root = args.keep_dir or tempfile.mkdtemp(prefix="loader_probe_")
    raw = os.path.join(root, "raw")
    data = os.path.join(root, "data")
    if not os.path.exists(os.path.join(
            data, "a9_nusc_coop_infos_train.pkl")):
        print(f"# building flagship-scale archive: {args.frames} frames, "
              "~60k pts, 1200x1920 imgs ...", flush=True)
        t0 = time.time()
        build_raw_archive(raw, "train", n_frames=args.frames, seed=0,
                          n_obj=12, n_ground=55000, pts_per_obj=400,
                          img_hw=(1200, 1920))
        print(f"# archive built in {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        subprocess.run(
            [sys.executable, "tools/create_data.py", "a9coop_nusc",
             "--root-path", raw, "--out-dir", data],
            cwd=REPO, check=True)
        print(f"# create_data in {time.time() - t0:.1f}s", flush=True)

    from cmtcoop_tpu.configs.presets import get_preset
    from cmtcoop_tpu.data.loader import build_train_loader

    preset = get_preset(args.preset)
    for nw in args.workers:
        loader, spe = build_train_loader(
            preset, data, args.batch_size, num_workers=nw, seed=0)
        loader.use_processes = args.use_processes and nw > 0
        n = 0
        for _ in loader.iter_epoch(0):      # warmup: page cache, lazy init
            n += 1
        rates = []
        for ep in range(1, args.epochs + 1):
            t0 = time.time()
            cnt = 0
            for batch in loader.iter_epoch(ep):
                cnt += 1
            dt = time.time() - t0
            rates.append(cnt * args.batch_size / dt)
        rate = max(rates)
        print(f"workers={nw}: {rate:.2f} samples/s "
              f"({spe} batches/epoch, best of {args.epochs} epochs)",
              flush=True)


if __name__ == "__main__":
    main()
