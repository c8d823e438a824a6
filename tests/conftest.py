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
# codegen entirely.  The directory is keyed by the host's CPU feature
# fingerprint (utils/compile_cache.py): XLA:CPU AOT entries record the
# builder's machine features, and loading them on a different host
# SIGSEGVs inside the cache deserializer (observed when this container
# migrated hosts mid-round).
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from swarmmap_tpu.utils.compile_cache import configure as _configure_cache

_configure_cache(jax, platform="cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # fresh, deterministic stream per test: results don't depend on
    # which tests ran before
    return np.random.RandomState(42)
