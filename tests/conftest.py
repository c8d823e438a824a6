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

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # fresh, deterministic stream per test: results don't depend on
    # which tests ran before
    return np.random.RandomState(42)
