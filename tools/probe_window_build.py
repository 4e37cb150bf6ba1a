#!/usr/bin/env python
"""A/B the (nb, window) key-window build in sorted_lookup: vmapped
dynamic_slice (current — traces as a serialized while of ~1.8k scalar
slices, ~16 ms/model) vs one lax.gather of contiguous slices vs an
elementwise take. L0 bench shapes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.tpu_probe import fetch_overhead, log, loop_time  # noqa: E402


def main():
    log("==== probe_window_build (L0 shapes: nk=153k, nb=300, win=512) ==")
    fetch_overhead()
    rng = np.random.default_rng(0)
    nk, nb, window = 153600, 300, 512
    keys = jnp.asarray(np.sort(rng.integers(0, 2**26, nk)), jnp.int32)
    starts = jnp.asarray(np.sort(rng.integers(0, nk - 1, nb)), jnp.int32)
    keys_pad = jnp.concatenate(
        [keys, jnp.full((window,), np.iinfo(np.int32).max, jnp.int32)])

    def build_dynslice(kp, st):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(kp, (s,), (window,)))(st)

    def build_gather(kp, st):
        return jax.lax.gather(
            kp, st[:, None],
            dimension_numbers=jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(window,),
            mode=jax.lax.GatherScatterMode.CLIP)

    def build_take(kp, st):
        idx = st[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
        return jnp.take(kp, idx, axis=0, mode="clip")

    builds = dict(dynslice=build_dynslice, gather=build_gather,
                  take=build_take)
    ref = None
    for name, b in builds.items():
        out = np.asarray(jax.jit(b)(keys_pad, starts))
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(out, ref)
    log("  parity: all variants identical")
    for name, b in builds.items():
        def fn(c, kp, st, b=b):
            # runtime-dependent no-op (a *0 carry gets constant-folded
            # and the build hoists out of the timing loop)
            st = jnp.where(c < -1e30, st * 0, st)
            w = b(kp, st)
            return jnp.sum(w, dtype=jnp.float32) * 1e-12
        loop_time(fn, keys_pad, starts, name=f"  windows {name}", n=1000)


if __name__ == "__main__":
    main()
