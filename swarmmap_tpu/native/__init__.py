"""Native C++ runtime components with ctypes bindings.

The reference implements its entire runtime in C++; this package carries
the pieces where native code actually pays on the host side of the TPU
design: exact quadtree keypoint distribution, op-log compaction, and
batch covisibility/redundancy bookkeeping.  Built lazily with g++ on
first use; every entry point has a pure-python fallback so the framework
works without a toolchain.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..utils.logging import get_logger

_log = get_logger("native")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False

_SRC = Path(__file__).parent / "src"
_OUT = Path(__file__).parent / "_libswarmmap.so"


def _build() -> ctypes.CDLL | None:
    global _build_failed
    sources = sorted(str(p) for p in _SRC.glob("*.cc"))
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_OUT), *sources]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return ctypes.CDLL(str(_OUT))
    except (subprocess.SubprocessError, OSError) as e:
        _log.warning("native build failed (%s) — using python fallbacks", e)
        _build_failed = True
        return None


def get_lib() -> ctypes.CDLL | None:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            if _OUT.exists():
                try:
                    newest_src = max(p.stat().st_mtime for p in _SRC.glob("*.cc"))
                    if _OUT.stat().st_mtime > newest_src:
                        _lib = ctypes.CDLL(str(_OUT))
                    else:
                        _lib = _build()
                except OSError:
                    _lib = _build()
            else:
                _lib = _build()
            if _lib is not None:
                _declare(_lib)
        return _lib


def _declare(lib: ctypes.CDLL) -> None:
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    lib.distribute_octree.restype = ctypes.c_int
    lib.distribute_octree.argtypes = [
        f32p, f32p, f32p, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, u8p,
    ]
    lib.covisibility_from_observations.restype = ctypes.c_int
    lib.covisibility_from_observations.argtypes = [
        i32p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
        i32p, i32p, i32p, ctypes.c_int,
    ]
    lib.aggregate_oplog.restype = ctypes.c_int
    lib.aggregate_oplog.argtypes = [
        i32p, i32p, i64p, ctypes.c_int, u8p, u8p, u8p,
    ]
    lib.redundancy_counts.restype = None
    lib.redundancy_counts.argtypes = [
        i32p, i32p, ctypes.c_int, ctypes.c_int, u8p,
        i32p, ctypes.c_int, i32p, i32p,
    ]


# ---------------------------------------------------------------------------
# Public wrappers (with python fallbacks)
# ---------------------------------------------------------------------------

def distribute_octree(xs, ys, responses, bounds, budget) -> np.ndarray:
    """Quadtree keypoint budgeting; returns bool keep-mask."""
    xs = np.ascontiguousarray(xs, np.float32)
    ys = np.ascontiguousarray(ys, np.float32)
    rs = np.ascontiguousarray(responses, np.float32)
    keep = np.zeros(len(xs), np.uint8)
    lib = get_lib()
    if lib is not None:
        lib.distribute_octree(
            xs, ys, rs, len(xs),
            float(bounds[0]), float(bounds[1]), float(bounds[2]), float(bounds[3]),
            int(budget), keep,
        )
        return keep.astype(bool)
    # fallback: grid-cell top-1 then global top-k (same policy as the
    # device path)
    order = np.argsort(-rs)[:budget]
    keep[order] = 1
    return keep.astype(bool)


def covisibility(kf_mp: np.ndarray, kf_alive: np.ndarray,
                 min_shared: int = 1, max_pairs: int = 1 << 20):
    """Batch covisibility rebuild; returns (i, j, count) arrays."""
    lib = get_lib()
    kf_mp = np.ascontiguousarray(kf_mp, np.int32)
    alive = np.ascontiguousarray(kf_alive, np.uint8)
    if lib is not None:
        oi = np.zeros(max_pairs, np.int32)
        oj = np.zeros(max_pairs, np.int32)
        oc = np.zeros(max_pairs, np.int32)
        n = lib.covisibility_from_observations(
            kf_mp, kf_mp.shape[0], kf_mp.shape[1], alive,
            int(min_shared), oi, oj, oc, max_pairs,
        )
        return oi[:n], oj[:n], oc[:n]
    # python fallback
    from collections import defaultdict

    observers = defaultdict(list)
    for k in range(kf_mp.shape[0]):
        if not alive[k]:
            continue
        for m in kf_mp[k][kf_mp[k] >= 0]:
            observers[int(m)].append(k)
    counts: dict[tuple, int] = defaultdict(int)
    for obs in observers.values():
        for a in range(len(obs)):
            for b in range(a + 1, len(obs)):
                counts[(obs[a], obs[b])] += 1
    pairs = [(i, j, c) for (i, j), c in counts.items() if c >= min_shared]
    if not pairs:
        return (np.zeros(0, np.int32),) * 3
    i, j, c = map(np.asarray, zip(*pairs))
    return i.astype(np.int32), j.astype(np.int32), c.astype(np.int32)


def redundancy(kf_mp: np.ndarray, kf_oct: np.ndarray, kf_alive: np.ndarray,
               cands: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-candidate (total, redundant) counts for keyframe culling."""
    kf_mp = np.ascontiguousarray(kf_mp, np.int32)
    kf_oct = np.ascontiguousarray(kf_oct, np.int32)
    alive = np.ascontiguousarray(kf_alive, np.uint8)
    cands = np.ascontiguousarray(cands, np.int32)
    total = np.zeros(len(cands), np.int32)
    red = np.zeros(len(cands), np.int32)
    lib = get_lib()
    if lib is not None:
        lib.redundancy_counts(
            kf_mp, kf_oct, kf_mp.shape[0], kf_mp.shape[1], alive,
            cands, len(cands), total, red,
        )
        return total, red
    # python fallback (same semantics)
    from collections import defaultdict

    obs = defaultdict(list)
    for k in range(kf_mp.shape[0]):
        if not alive[k]:
            continue
        for p in np.where(kf_mp[k] >= 0)[0]:
            obs[int(kf_mp[k, p])].append((k, int(kf_oct[k, p])))
    for c, k in enumerate(cands):
        t = r = 0
        for p in np.where(kf_mp[k] >= 0)[0]:
            entries = obs.get(int(kf_mp[k, p]))
            if not entries:
                continue
            t += 1
            lvl = int(kf_oct[k, p])
            better = sum(1 for ok, ooct in entries if ok != k and ooct <= lvl + 1)
            if better >= 3:
                r += 1
        total[c] = t
        red[c] = r
    return total, red


def aggregate_keep(kind: np.ndarray, func: np.ndarray, target: np.ndarray,
                   last_writer: np.ndarray, is_badflag: np.ndarray) -> np.ndarray:
    """Op-log compaction keep-mask (reference: Mapit::Aggregate).

    kind/func are small int ids; last_writer/is_badflag are per-func-id
    flag tables. Returns a bool keep mask; for last-writer funcs the
    LAST record survives."""
    kind = np.ascontiguousarray(kind, np.int32)
    func = np.ascontiguousarray(func, np.int32)
    target = np.ascontiguousarray(target, np.int64)
    lw = np.ascontiguousarray(last_writer, np.uint8)
    bf = np.ascontiguousarray(is_badflag, np.uint8)
    keep = np.zeros(len(kind), np.uint8)
    lib = get_lib()
    if lib is not None:
        lib.aggregate_oplog(kind, func, target, len(kind), lw, bf, keep)
        return keep.astype(bool)
    # python fallback
    keep[:] = 1
    dead = {(int(t), int(k)) for t, k, f in zip(target, kind, func) if bf[f]}
    last: dict[tuple, int] = {}
    for i in range(len(kind)):
        if (int(target[i]), int(kind[i])) in dead and not bf[func[i]]:
            keep[i] = 0
            continue
        if lw[func[i]]:
            key = (int(target[i]), int(kind[i]), int(func[i]))
            prev = last.get(key)
            if prev is not None:
                keep[prev] = 0
            last[key] = i
    return keep.astype(bool)
