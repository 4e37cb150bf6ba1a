"""End-to-end CLI integration on a synthesized miniature TUMTraf archive.

The one rehearsal for real data (VERDICT r3 #4): build a raw OpenLabel
dataset from scratch — PCD clouds in all THREE encodings (ascii, binary,
binary_compressed: real TUMTraf archives ship compressed), OpenLabel
JSONs, camera JPGs — then drive the actual tools end to end:

    tools/create_data.py a9coop_nusc  ->  infos pkl + gt database
    tools/train.py  (2 steps, tiny preset)  ->  orbax checkpoint
    tools/test.py --eval bbox --work-dir  ->  nusc-protocol artifacts

and assert metrics_summary.json exists with a finite mAP. Catches
cross-tool drift (paths, pkl schema, calib plumbing, checkpoint layout)
that no unit test sees. Reference call stacks: SURVEY §3.1-3.4.
"""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from cmtcoop_tpu.data.synthetic_archive import build_raw_archive

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = [
    "tiny=True", "voxel_size=(0.6,0.6,0.2)", "grid_size=(240,240,40)",
    "img_size=(128,256)", "ida_final_dim=(128,256)",
    "ida_resize_lim=(0.5,0.5)", "max_points=20000",
    "max_voxels_train=4096", "max_voxels_eval=4096", "max_gt=8",
    "dn_groups=2",
]

_build_raw = build_raw_archive  # archive builder lives in the package now


def _run(cmd, cwd=REPO, timeout=1500):
    env = dict(os.environ, CMTCOOP_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    # replace (not just append) the device-count flag: the parent test
    # process runs on the conftest's virtual 8-device mesh
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    for f in ("--xla_force_host_platform_device_count=1",
              "--xla_llvm_disable_expensive_passes=true",
              "--xla_backend_optimization_level=0"):
        if f.split("=")[0] not in " ".join(flags):
            flags.append(f)
    env["XLA_FLAGS"] = " ".join(flags)
    res = subprocess.run(
        [sys.executable] + cmd, cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True)
    assert res.returncode == 0, (
        f"{cmd} failed rc={res.returncode}\nstdout:\n{res.stdout[-4000:]}"
        f"\nstderr:\n{res.stderr[-4000:]}")
    return res


@pytest.mark.slow
def test_create_train_eval_roundtrip(tmp_path):
    raw = str(tmp_path / "raw")
    data = str(tmp_path / "data")
    work = str(tmp_path / "work")
    evald = str(tmp_path / "eval")
    _build_raw(raw, "train", n_frames=3, seed=0)
    _build_raw(raw, "val", n_frames=3, seed=1)

    # 1. create_data: PCDs (all three encodings) -> bins + infos + gt db
    _run(["tools/create_data.py", "a9coop_nusc", "--root-path", raw,
          "--out-dir", data])
    with open(os.path.join(data, "a9_nusc_coop_infos_train.pkl"),
              "rb") as f:
        infos = pickle.load(f)
    if isinstance(infos, dict):
        infos = infos["infos"]
    assert len(infos) == 3
    assert os.path.exists(
        os.path.join(data, "a9_nusc_coop_dbinfos_train.pkl"))
    for info in infos:
        assert os.path.exists(info["vehicle_lidar_path"])
        pts = np.fromfile(info["registered_lidar_path"],
                          np.float32).reshape(-1, 5)
        assert len(pts) > 1000 and np.isfinite(pts).all()
        assert info["gt_boxes"].shape[1] == 7

    # 2. train 2 steps on the real loader -> checkpoint, with a
    # mid-training val eval (EvalHook equivalent) at step 2
    _run(["tools/train.py", "cmt_fusion_coop_tumtraf",
          "--data-root", data, "--work-dir", work, "--epochs", "1",
          "--steps", "2", "--num-workers", "0",
          "--eval-interval-steps", "2", "--eval-max-samples", "2",
          "--cfg-options"] + CFG)
    ckpts = os.path.join(work, "ckpts")
    assert os.path.isdir(ckpts) and os.listdir(ckpts)
    # the eval hook must have logged a finite val mAP to metrics.jsonl
    with open(os.path.join(work, "metrics.jsonl")) as f:
        evals = [json.loads(l) for l in f if '"eval"' in l]
    assert evals, "no mid-training eval record in metrics.jsonl"
    assert np.isfinite(evals[-1]["eval"]["object/map"])
    assert np.isfinite(evals[-1]["eval"]["object/nds"])

    # 3. eval the checkpoint over val through the nusc protocol
    # --batch-size 2 over 3 val frames: one full batch + one tail batch
    # padded by repeating the last sample (single compiled shape)
    _run(["tools/test.py", "cmt_fusion_coop_tumtraf", ckpts,
          "--data-root", data, "--split", "val", "--eval", "bbox",
          "--work-dir", evald, "--dtype", "float32", "--batch-size", "2",
          "--cfg-options"] + CFG)
    with open(os.path.join(evald, "metrics_summary.json")) as f:
        summary = json.load(f)
    assert np.isfinite(summary["mean_ap"])
    assert os.path.exists(os.path.join(evald, "results_nusc.json"))
