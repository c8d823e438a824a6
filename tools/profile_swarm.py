"""Stage-level profile of Swarm.step on the current backend.

Prints the per-stage breakdown (prepare / h2d / dispatch / fetch /
commit / local-mapping / sync), RPC counts per frame, and the measured
per-RPC tunnel floor — the accounting behind bench.py's tunnel-adjusted
system estimate.
"""
from __future__ import annotations

import json
import os
import time

import jax

cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from swarmmap_tpu.swarm import Swarm, SwarmConfig  # noqa: E402
from swarmmap_tpu.utils import datasets  # noqa: E402
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings  # noqa: E402
from swarmmap_tpu.utils.stats import STATS, measure_rpc_floor  # noqa: E402

N_AGENTS = 3
HW = (480, 752)
N_FRAMES = int(os.environ.get("PROFILE_FRAMES", "60"))


def main():
    print("backend:", jax.default_backend())
    floor = measure_rpc_floor()
    print("rpc floor:", floor)

    seqs = [
        datasets.synthesize_sequence(
            n_frames=N_FRAMES, hw=HW, seed=a, agent=a, n_points=1500
        )
        for a in range(N_AGENTS)
    ]
    w = seqs[0].world
    settings = Settings(
        camera=CameraConfig(
            fx=float(w.K[0, 0]), fy=float(w.K[1, 1]),
            cx=float(w.K[0, 2]), cy=float(w.K[1, 2]),
            fps=20.0, width=HW[1], height=HW[0],
        ),
        orb=OrbConfig(n_features=1000, n_levels=8),
    )
    swarm = Swarm(N_AGENTS, settings,
                  config=SwarmConfig(
                      push_every=20, report_every=10,
                      async_mapping=os.environ.get("PROFILE_SYNC") != "1",
                      async_server=os.environ.get("PROFILE_SYNC") != "1",
                  ),
                  run_server_gba=False)
    times = []
    # warm phase (init + compiles), then reset stats for the steady phase
    split = N_FRAMES // 3
    for i in range(N_FRAMES):
        if i == split:
            STATS.reset()
            times.clear()
        t0 = time.perf_counter()
        swarm.step([s.read(i) for s in seqs], float(seqs[0].timestamps[i]))
        times.append(time.perf_counter() - t0)
    swarm.finish()
    tail = sorted(times)
    p50 = tail[len(tail) // 2]
    n_steady = len(times)
    print(f"\nsteady frames: {n_steady}  p50={1e3*p50:.1f}ms "
          f"p95={1e3*tail[min(int(0.95*len(tail)), len(tail)-1)]:.1f}ms "
          f"fps/agent={1/p50:.1f}")
    print("\n" + STATS.report())
    s = STATS.summary()
    rpcs = sum(s.get(k, {}).get("count", 0)
               for k in ("rpc_fetch", "rpc_h2d", "rpc_dispatch"))
    print(f"\nRPCs/frame: {rpcs / max(n_steady, 1):.2f}")
    print(json.dumps({"p50_ms": round(1e3 * p50, 1), **floor}))


if __name__ == "__main__":
    main()
