"""Multi-host bootstrap test (VERDICT r2 missing #3 / SURVEY §5.8 DCN).

Two OS processes x 4 virtual CPU devices each, connected by
`initialize_multihost` (jax.distributed + gloo collectives) into ONE
8-device dp mesh — the CPU-backend stand-in for the reference's
`--nnodes` torch.distributed.launch path (tools/dist_train.sh:10-20).
Each process feeds its own half of the global batch through
`shard_batch` (DistributedSampler semantics) and runs a jitted
global-batch gradient step; the test asserts both processes see the
gradient of the GLOBAL batch (sum over both processes' data), proving
the data actually crossed hosts.
"""
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
# fresh-process pinning (the conftest pins the parent, not children)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from cmtcoop_tpu.parallel.mesh import (
    initialize_multihost, make_mesh, replicated, shard_batch)
got_pid = initialize_multihost(f"localhost:{port}", nproc, pid)
assert got_pid == pid, (got_pid, pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

import jax.numpy as jnp
import numpy as np
mesh = make_mesh()  # global: (8, 1) dp x mp
assert mesh.devices.shape == (4 * nproc, 1), mesh.devices.shape

# process-local slice of a deterministic global batch: global rows are
# x[i] = i + 1, y[i] = 2 * (i + 1); process p owns rows [4p, 4p+4)
rows = np.arange(4 * pid, 4 * pid + 4, dtype=np.float32) + 1.0
local = dict(x=rows[:, None], y=(2.0 * rows)[:, None])
batch = shard_batch(local, mesh)
assert batch["x"].shape == (4 * nproc, 1), batch["x"].shape  # global dim

w0 = jnp.zeros((1,), jnp.float32)

def loss_fn(w, b):
    pred = b["x"] * w
    return jnp.mean((pred - b["y"]) ** 2)

grad = jax.jit(jax.grad(loss_fn),
               out_shardings=replicated(mesh))(w0, batch)
# analytic global-batch gradient at w=0: -2/N * sum(x_i * y_i)
xs = np.arange(4 * nproc, dtype=np.float32) + 1.0
expect = -2.0 / len(xs) * np.sum(xs * 2.0 * xs)
got = float(jax.device_get(grad)[0])
assert abs(got - expect) < 1e-3, (got, expect)
print(f"proc {pid}: global grad {got:.3f} == {expect:.3f} OK", flush=True)
"""


def test_two_process_dp_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "OK" in out, out


def test_loader_process_slicing():
    """PrefetchLoader with num_processes yields per-process slices whose
    concatenation equals the single-process global batch (DDP loader
    equivalence, any process count)."""
    from cmtcoop_tpu.data.loader import PrefetchLoader

    class DS:
        def __getitem__(self, i):
            return {"v": np.full((2,), float(i), np.float32)}

    idx = np.arange(16)
    full = PrefetchLoader(DS(), idx, batch_size=8, num_workers=1,
                          shuffle_seed=3)
    parts = [PrefetchLoader(DS(), idx, batch_size=8, num_workers=1,
                            shuffle_seed=3, process_id=p, num_processes=2)
             for p in range(2)]
    for b in range(2):
        ref = full._make_batch(full.epoch_indices(1), b)["v"]
        got = np.concatenate(
            [pt._make_batch(pt.epoch_indices(1), b)["v"] for pt in parts])
        np.testing.assert_array_equal(ref, got)
