"""Test config: run on a virtual 8-device CPU mesh (no TPU needed).

The container's sitecustomize imports JAX at interpreter startup with
JAX_PLATFORMS=axon (the real-TPU tunnel), so env vars are too late here —
we must override through jax.config before any backend is initialized.
Multi-chip sharding is validated on the host platform per the driver
contract; the real-TPU path is exercised by bench.py.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the heavyweight programs (8-device shard_map
# cohort, sim3/BA optimizers) codegen ONCE per machine instead of every
# run.  Besides the big wall-clock win, this sidesteps a reproducible
# XLA:CPU codegen segfault that only manifests late in a full-suite run
# (same program compiles fine in isolation) — cached executables skip
# codegen entirely.
# NOTE: XLA:CPU AOT cache entries record the builder's machine features
# (cpu_aot_loader warns on mismatch, e.g. +prefer-no-scatter, "could
# lead to execution errors such as SIGILL") — if the suite ever
# SIGILLs/SIGSEGVs right after such a warning, delete the cache dir; it
# was written by a host with a different CPU feature set.
_cache = os.environ.get("SWARMMAP_TEST_CACHE", "/root/.jax_cache_cpu")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except (OSError, ValueError):
    pass

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # fresh, deterministic stream per test: results don't depend on
    # which tests ran before
    return np.random.RandomState(42)
