"""Profiling hooks (reference counterpart: NVTX PUSH_RANGE/POP_RANGE,
include/Utils.hpp:17-40).

On TPU the equivalents are jax.profiler trace annotations, which show up
in XProf/TensorBoard timelines exactly like NVTX ranges do in Nsight.
Enable trace capture with SWARMMAP_TRACE_DIR=<dir>.
"""
from __future__ import annotations

import contextlib
import os

import jax


def named_range(label: str):
    """Annotate a host-side region; device ops launched inside inherit
    the annotation in the trace (NVTX range equivalent)."""
    return jax.profiler.TraceAnnotation(label)


def device_scope(label: str):
    """Annotate traced computations (inside jit)."""
    return jax.named_scope(label)


@contextlib.contextmanager
def maybe_trace():
    """Capture a full runtime trace when SWARMMAP_TRACE_DIR is set."""
    trace_dir = os.environ.get("SWARMMAP_TRACE_DIR", "")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield
