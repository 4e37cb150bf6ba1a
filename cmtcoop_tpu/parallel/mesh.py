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

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    """Device-put every leaf with its batch dimension sharded over dp."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), batch)
