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

from cmtcoop_tpu.data.converters.pcd import lzf_compress_literal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CAMS = ("s110_camera_basler_south1_8mm", "s110_camera_basler_south2_8mm",
        "s110_camera_basler_north_8mm", "vehicle_camera_basler_16mm")
REG_DIR = (
    "s110_lidar_ouster_south_and_vehicle_lidar_robosense_registered")

CFG = [
    "tiny=True", "voxel_size=(0.6,0.6,0.2)", "grid_size=(240,240,40)",
    "img_size=(128,256)", "ida_final_dim=(128,256)",
    "ida_resize_lim=(0.5,0.5)", "max_points=20000",
    "max_voxels_train=4096", "max_voxels_eval=4096", "max_gt=8",
    "dn_groups=2",
]


def _pcd_header(n, fmt):
    return (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
        "TYPE F F F F\nCOUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA {fmt}\n").encode("ascii")


def _write_pcd(path, pts, inten, fmt):
    n = len(pts)
    cols = [pts[:, 0], pts[:, 1], pts[:, 2], inten]
    with open(path, "wb") as f:
        f.write(_pcd_header(n, fmt))
        if fmt == "ascii":
            np.savetxt(f, np.stack(cols, -1), fmt="%.6g")
        elif fmt == "binary":
            rec = np.zeros(n, dtype=[(c, np.float32) for c in "xyzi"])
            for name, col in zip("xyzi", cols):
                rec[name] = col.astype(np.float32)
            f.write(rec.tobytes())
        else:  # binary_compressed: SoA payload + lzf + size prefix
            buf = b"".join(c.astype(np.float32).tobytes() for c in cols)
            comp = lzf_compress_literal(buf)
            f.write(np.array([len(comp), len(buf)], np.uint32).tobytes())
            f.write(comp)


def _scene(rng, n_obj=4):
    """Clustered boxes + points on them (infra/registered frame)."""
    boxes = np.zeros((n_obj, 7), np.float32)
    boxes[:, :2] = rng.uniform(-40, 40, (n_obj, 2))
    boxes[:, 2] = rng.uniform(-6, -3, n_obj)          # z center
    boxes[:, 3:6] = rng.uniform(1.5, 4.0, (n_obj, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_obj)
    pts = [rng.uniform(-60, 60, (1500, 3)).astype(np.float32)]
    pts[0][:, 2] = rng.uniform(-7.5, -7.0, 1500)      # ground
    for b in boxes:
        local = rng.uniform(-0.5, 0.5, (120, 3)) * b[3:6]
        c, s = np.cos(b[6]), np.sin(b[6])
        rot = local.copy()
        rot[:, 0] = local[:, 0] * c - local[:, 1] * s
        rot[:, 1] = local[:, 0] * s + local[:, 1] * c
        pts.append((rot + b[:3]).astype(np.float32))
    return boxes, np.concatenate(pts)


def _yaw_to_quat(yaw):
    # parse_openlabel_objects: yaw = euler_z of (x,y,z,w); box stores -yaw
    return [0.0, 0.0, float(np.sin(yaw / 2)), float(np.cos(yaw / 2))]


def _openlabel(boxes, names, num_pts, ts, v2i):
    objs = {}
    for i, (b, nm, npts) in enumerate(zip(boxes, names, num_pts)):
        objs[f"obj{i}"] = {"object_data": {
            "type": nm,
            "cuboid": {
                "val": [float(b[0]), float(b[1]), float(b[2])]
                + _yaw_to_quat(b[6])
                + [float(b[3]), float(b[4]), float(b[5])],
                "attributes": {"num": [
                    {"name": "num_points", "val": int(npts)}]},
            }}}
    return {"openlabel": {"frames": {"0": {
        "frame_properties": {
            "timestamp": ts,
            "point_cloud_file_names": [
                f"{ts}_vehicle_lidar_robosense.pcd",
                f"{ts}_000000_s110_lidar_ouster_south.pcd"],
            "transforms": {
                "vehicle_lidar_robosense_to_s110_lidar_ouster_south": {
                    "transform_src_to_dst": {
                        "matrix4x4": v2i.tolist()}}},
        },
        "objects": objs,
    }}}}


def _build_raw(root, split_dir, n_frames, seed):
    from PIL import Image
    rng = np.random.default_rng(seed)
    sd = os.path.join(root, split_dir)
    for sub in ("vehicle_lidar_robosense", "s110_lidar_ouster_south",
                REG_DIR):
        os.makedirs(os.path.join(sd, "point_clouds", sub), exist_ok=True)
    os.makedirs(os.path.join(sd, "labels_point_clouds", REG_DIR),
                exist_ok=True)
    for cam in CAMS:
        os.makedirs(os.path.join(sd, "images", cam), exist_ok=True)

    names_pool = ["CAR", "TRUCK", "VAN", "PEDESTRIAN"]
    v2i = np.eye(4, dtype=np.float32)
    v2i[:3, 3] = [3.0, -2.0, 0.1]
    fmts = ["ascii", "binary", "binary_compressed"]
    for fi in range(n_frames):
        ts = f"16466673{fi:02d}_0000000{fi:02d}"
        boxes, reg_pts = _scene(rng)
        names = [names_pool[i % len(names_pool)] for i in range(len(boxes))]
        # vehicle cloud: registered cloud pulled back through inv(v2i)
        h = np.concatenate(
            [reg_pts, np.ones((len(reg_pts), 1), np.float32)], -1)
        veh_pts = (h @ np.linalg.inv(v2i).T)[:, :3]
        infra_pts = reg_pts[::2]
        inten = rng.uniform(0, 255, len(reg_pts)).astype(np.float32)
        clouds = {
            "vehicle_lidar_robosense": veh_pts,
            "s110_lidar_ouster_south": infra_pts,
            REG_DIR: reg_pts,
        }
        for si, (sub, pts) in enumerate(clouds.items()):
            fmt = fmts[(fi + si) % 3]   # every encoding gets exercised
            _write_pcd(
                os.path.join(sd, "point_clouds", sub, f"{ts}_{sub}.pcd"),
                pts, inten[:len(pts)], fmt)
        lbl = _openlabel(boxes, names, [120] * len(boxes), ts, v2i)
        with open(os.path.join(sd, "labels_point_clouds", REG_DIR,
                               f"{ts}.json"), "w") as f:
            json.dump(lbl, f)
        for cam in CAMS:
            img = rng.integers(0, 255, (256, 512, 3), np.uint8)
            Image.fromarray(img).save(
                os.path.join(sd, "images", cam, f"{ts}_{cam}.jpg"))


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

    # 2. train 2 steps on the real loader -> checkpoint
    _run(["tools/train.py", "cmt_fusion_coop_tumtraf",
          "--data-root", data, "--work-dir", work, "--epochs", "1",
          "--steps", "2", "--num-workers", "0",
          "--cfg-options"] + CFG)
    ckpts = os.path.join(work, "ckpts")
    assert os.path.isdir(ckpts) and os.listdir(ckpts)

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
