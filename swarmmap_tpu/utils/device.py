"""Batched device->host transfer.

On a tunneled TPU (this container's axon relay), fetching device arrays
one np.asarray at a time costs SECONDS per array, while one
jax.device_get of a whole pytree is a single ~30ms round trip.  Every
host-side consumer of device results must fetch through `fetch()` —
one call per logical step, never per array.
"""
from __future__ import annotations

import jax
import numpy as np

from .stats import STATS


def fetch(*arrays):
    """Transfer any number of device arrays (or pytrees) to host numpy in
    ONE batched round trip.  Returns a tuple matching the inputs (or the
    single object if one argument).  Wall time is recorded per call (and
    separately for the main thread) — the accounting behind bench.py's
    tunnel-adjusted estimate."""
    import threading
    import time

    STATS.bump("rpc_fetch")
    t0 = time.perf_counter()
    out = jax.device_get(arrays if len(arrays) > 1 else arrays[0])
    dt = time.perf_counter() - t0
    STATS.times["fetch_wall"].append(dt)
    if threading.current_thread() is threading.main_thread():
        STATS.times["fetch_wall_main"].append(dt)
    return out


def upload(*arrays):
    """Host->device transfer with accounting: one logical upload event
    (jax batches the device_put of a tree into one transfer program).
    Returns a tuple matching the inputs (or the single array)."""
    STATS.bump("rpc_h2d")
    out = jax.device_put(arrays if len(arrays) > 1 else arrays[0])
    return out


def fetch_np(*arrays):
    """Like fetch(), but guarantees np.ndarray leaves."""
    got = fetch(*arrays)
    if len(arrays) == 1:
        return jax.tree.map(np.asarray, got)
    return tuple(jax.tree.map(np.asarray, g) for g in got)
