"""Tracing / profiling utilities (SURVEY §5.1 superset).

The reference only has wall-clock FPS scripts (tools/benchmark.py:109-138);
here: a jax.profiler trace context manager producing TensorBoard-loadable
traces, plus a host-fetch-synchronized timing helper that is honest on
remote-relay TPU setups where block_until_ready can return early.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "runs/trace"):
    """`with trace(): step()` -> profile in `logdir` (view in TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def materialize(tree) -> float:
    """Force a device->host fetch of a scalar derived from `tree`."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def time_fn(fn: Callable, *args, warmup: int = 3, iters: int = 10,
            name: Optional[str] = None) -> Dict[str, float]:
    """Wall-clock a jitted function with host-fetch synchronization."""
    t0 = time.time()
    materialize(fn(*args))
    compile_s = time.time() - t0
    for _ in range(warmup):
        materialize(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        materialize(fn(*args))
    per_iter = (time.time() - t0) / iters
    out = {"compile_s": compile_s, "per_iter_s": per_iter,
           "fps": 1.0 / per_iter}
    if name:
        print(f"{name}: {per_iter * 1e3:.1f} ms ({out['fps']:.2f}/s, "
              f"compile {compile_s:.1f}s)")
    return out


class StepTimer:
    """Rolling sec/it + data-wait split for the train loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self.data_times = []
        self._t = time.time()

    def data_ready(self):
        now = time.time()
        self.data_times.append(now - self._t)
        self._t = now

    def step_done(self):
        now = time.time()
        self.times.append(now - self._t)
        self._t = now
        if len(self.times) > self.window:
            self.times.pop(0)
            self.data_times.pop(0)

    @property
    def sec_per_step(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def data_fraction(self) -> float:
        tot = sum(self.times) + sum(self.data_times)
        return sum(self.data_times) / max(tot, 1e-9)
