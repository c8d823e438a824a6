"""Persistent-compile-cache helpers.

XLA:CPU AOT cache entries record the builder's machine features; loading
one on a host with a different CPU feature set is undefined behavior
(cpu_aot_loader warns "could lead to execution errors such as SIGILL" —
observed as a SIGSEGV inside compilation_cache.get_executable_and_time
when this container migrated hosts mid-round).  Keying the cache
directory by the host's CPU feature fingerprint makes a migration start
a fresh cache instead of deserializing a poisoned one.
"""
from __future__ import annotations

import hashlib
import os


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nofp"


def cpu_cache_dir() -> str:
    """Host-feature-keyed CPU compile-cache directory."""
    env = os.environ.get("SWARMMAP_TEST_CACHE")
    if env:
        return env
    return f"/root/.jax_cache_cpu_{_cpu_fingerprint()}"


def configure(jax, platform: str | None = "cpu") -> str:
    """Point jax at the right persistent cache (and optionally force the
    platform; None = keep whatever jax_platforms already says).
    Returns the cache dir.  Call BEFORE any backend use."""
    if platform:
        jax.config.update("jax_platforms", platform)
    else:
        platform = getattr(jax.config, "jax_platforms", None) or "tpu"
    cache = ("cpu" in platform and cpu_cache_dir()
             or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, ValueError):
        pass
    return cache
