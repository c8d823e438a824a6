"""cProfile the bench's Swarm.step loop (bench configuration, tunnel
device by default) — identifies the host-side hotspots behind the
full-system throughput gap (VERDICT r4 weak #3).

Usage: python tools/prof_swarm_step.py [n_frames]
"""
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SWARMMAP_DIAG_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SWARMMAP_DIAG_PLATFORM"])
cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from swarmmap_tpu.swarm import Swarm, SwarmConfig
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings
from swarmmap_tpu.utils.stats import STATS

N_AGENTS = 3
HW = (480, 752)


def main(n_frames: int = 40):
    seqs = [
        datasets.synthesize_sequence(
            n_frames=n_frames, hw=HW, seed=a, agent=a, n_points=1500
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
                  config=SwarmConfig(push_every=20, report_every=10,
                                     async_mapping=True, async_server=True,
                                     double_buffer=True),
                  run_server_gba=False)
    # pre-render all frames so imaging cost stays out of the loop
    frames = [[s.read(i) for s in seqs] for i in range(n_frames)]
    warm = n_frames // 3
    for i in range(warm):
        swarm.step(frames[i], float(seqs[0].timestamps[i]))
    STATS.reset()
    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    for i in range(warm, n_frames):
        swarm.step(frames[i], float(seqs[0].timestamps[i]))
    prof.disable()
    dt = time.perf_counter() - t0
    n = n_frames - warm
    print(f"\n{n} steady frames in {dt:.2f}s -> {dt / n * 1e3:.1f} ms/step "
          f"({n / dt:.2f} fps/agent)")
    print("\n--- STATS stages (per steady window) ---")
    for k, v in sorted(STATS.summary().items()):
        if isinstance(v, dict):
            print(f"  {k:28s} count={v.get('count', 0):5d} "
                  f"total={v.get('total_s', 0.0) * 1e3:8.1f}ms")
    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue())
    swarm.finish()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
