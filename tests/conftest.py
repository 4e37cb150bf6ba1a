"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip behavior (data-parallel psum, eval all_gather) is exercised on a
virtual CPU mesh exactly as the driver's dryrun does; real-TPU benches live in
bench.py, not in the test suite.
"""
import os

# NOTE: the axon sitecustomize force-registers the TPU platform at
# interpreter startup, so JAX_PLATFORMS env alone is ignored; the config
# update below is what actually pins tests to the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# compile-speed flags (same rationale as __graft_entry__'s dryrun): the
# suite certifies SEMANTICS on the CPU mesh; XLA:CPU codegen quality is
# irrelevant, and compilation dominates suite wall time on this 1-core
# box (round-2 suite: 46 min, mostly cold compiles)
for f in ("--xla_llvm_disable_expensive_passes=true",
          "--xla_backend_optimization_level=0"):
    if f.split("=")[0] not in flags:
        flags += " " + f
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: most test time is XLA compilation. NOTE: this
# jax build ignores the JAX_COMPILATION_CACHE_DIR env var — the explicit
# config.update is required (verified empirically; the env-var form
# silently cached nothing).
# CMTCOOP_NO_COMPILE_CACHE=1 disables it: this jax build SEGFAULTS
# deserializing some large cached XLA:CPU executables (observed twice in
# r5 on the slow tier, compilation_cache.get_executable_and_time, fresh
# cache dir both times) — run the slow tier with the cache off until the
# jax bug is gone. The default tier is unaffected (5:23, r5).
if os.environ.get("CMTCOOP_NO_COMPILE_CACHE", "0") != "1":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live executables between test modules.

    One long single-process run accumulates every compiled executable; at
    ~90 tests the XLA:CPU client segfaults inside backend_compile (seen
    deterministically in test_schedule_resume when run after the full
    suite prefix, never in isolation). The persistent on-disk cache
    (JAX_COMPILATION_CACHE_DIR) keeps recompiles cheap.
    """
    yield
    import jax

    jax.clear_caches()
