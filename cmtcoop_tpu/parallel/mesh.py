"""Device mesh + sharding helpers (the NCCL/DDP replacement, SURVEY §5.8).

The reference parallelizes with torch.distributed.launch + NCCL DDP
(tools/dist_train.sh:10-20, train.py:197-204). TPU-native equivalent:
single-controller JAX with a named mesh; batches are sharded over the "dp"
axis, parameters replicated, and XLA/GSPMD inserts the gradient all-reduce
over ICI — no explicit collectives in model code. `reduce_mean` semantics
(cmt_head.py:793-796) fall out automatically because every reduction sees
the *global* batch under jit sharding.

A 2D mesh ("dp", "mp") is created so later rounds can shard the ~50k-token
cross-attention KV over "mp" (ring attention) without re-plumbing callers.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Multi-host bootstrap (the reference's `--nnodes` path,
    tools/dist_train.sh:10-20): `jax.distributed.initialize` connects this
    process to the coordinator so `jax.devices()` becomes the GLOBAL
    device list (all hosts of the slice; collectives ride ICI within a
    slice and DCN across slices, handled by the runtime). Must run before
    the backend initializes. Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on TPU
    pods all three are auto-detected from the metadata server and may be
    omitted entirely). Returns this process's index.

    Verified on the CPU backend (gloo collectives) by
    tests/test_multihost.py — two processes x 4 virtual devices forming
    one 8-device dp mesh with a global-batch gradient step.
    """
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = (
            num_processes if num_processes is not None
            else int(os.environ["JAX_NUM_PROCESSES"]))
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = (
            process_id if process_id is not None
            else int(os.environ["JAX_PROCESS_ID"]))
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def make_mesh(num_dp: Optional[int] = None, num_mp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_dp is None:
        num_dp = len(devices) // num_mp
    if len(devices) < num_dp * num_mp:
        raise ValueError(
            f"make_mesh needs {num_dp}x{num_mp} devices but only "
            f"{len(devices)} are visible ({devices[0].platform}). For a "
            f"virtual multi-device CPU mesh, pin the platform BEFORE the "
            f"JAX backend initializes: JAX_PLATFORMS=cpu plus "
            f"jax.config.update('jax_num_cpu_devices', n) — see "
            f"tests/conftest.py / __graft_entry__._pin_virtual_cpu_mesh.")
    dev = np.asarray(devices[: num_dp * num_mp]).reshape(num_dp, num_mp)
    return Mesh(dev, ("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for every batch leaf."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put every leaf with its batch dimension sharded over dp.

    Single-process: `batch` is the global batch. Multi-process (after
    `initialize_multihost`): `batch` is this process's LOCAL slice — the
    global batch is assembled from each process's data (DDP loader
    semantics: every host feeds its own shard), so the global batch dim
    is local_batch * num_processes.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), batch)
