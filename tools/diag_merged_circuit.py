"""Diagnose merged-vs-two-phase divergence on the loop-closing circuit.

Runs the exact fixture from tests/test_loop_closing.py with
SWARMMAP_MERGED_MAPPING on/off, dumping per-sync map stats, and diffs
the first divergence point.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the container's sitecustomize initializes the axon (tunneled-TPU)
# platform before env vars can bite; diagnostics run on the CPU backend
# like the test suite (override with SWARMMAP_DIAG_PLATFORM=axon)
import jax

jax.config.update("jax_platforms",
                  os.environ.get("SWARMMAP_DIAG_PLATFORM", "cpu"))
from swarmmap_tpu.utils.compile_cache import configure as _configure_cache

_configure_cache(jax, platform=None)  # platform set above; cache keyed by host

from swarmmap_tpu.swarm import Swarm, SwarmConfig
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings


def run(merged: bool, seed: int = 2, n_frames: int = 100):
    hw = (240, 320)
    seq = datasets.synthesize_sequence(
        n_frames=n_frames, hw=hw, seed=seed, agent=0, n_points=700,
        motion="circuit")
    w = seq.world
    settings = Settings(
        camera=CameraConfig(
            fx=float(w.K[0, 0]), fy=float(w.K[1, 1]),
            cx=float(w.K[0, 2]), cy=float(w.K[1, 2]),
            fps=20.0, width=hw[1], height=hw[0],
        ),
        orb=OrbConfig(n_features=400, n_levels=4),
    )
    swarm = Swarm(1, settings,
                  config=SwarmConfig(push_every=10, report_every=5),
                  run_server_gba=True)
    swarm.agents[0].system.local_mapping._merged_mapping = merged
    trace = []
    n_tracked = 0
    for i in range(n_frames):
        T = swarm.agents[0].track(seq.read(i), float(seq.timestamps[i]))
        if T is not None:
            n_tracked += 1
        swarm.frame_count += 1
        if swarm.frame_count % 10 == 0:
            swarm.sync()
        st = swarm.agents[0].system.store
        trace.append((
            i,
            int(st.kf_alive[: st.n_kf].sum()),
            int(st.mp_alive[: st.n_mp].sum()),
            sum(len(v) for v in st.obs.values()),
        ))
    swarm.finish()
    med = swarm.mediators[0]
    lc = med.loop_closing
    print(f"merged={merged}: tracked={n_tracked}, "
          f"loops={lc.n_loops_closed}, fused={lc.n_fused}, "
          f"client kf/mp/obs={trace[-1][1:]}, "
          f"server kf={int(med.store.kf_alive[: med.store.n_kf].sum())} "
          f"mp={int(med.store.mp_alive[: med.store.n_mp].sum())}")
    # loop detection internals
    if hasattr(lc, "n_candidates_seen"):
        print(f"  candidates_seen={lc.n_candidates_seen}")
    return trace, lc.n_loops_closed


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    tr_on, loops_on = run(True, seed)
    tr_off, loops_off = run(False, seed)
    for a, b in zip(tr_on, tr_off):
        if a != b:
            print(f"first divergence at frame {a[0]}: merged kf/mp/obs="
                  f"{a[1:]} vs two-phase {b[1:]}")
            break
    else:
        print("traces identical")
    # full trace tail
    print("frame  merged(kf,mp,obs)  two-phase(kf,mp,obs)")
    for a, b in zip(tr_on, tr_off):
        if a[0] % 10 == 9 or a != b:
            mark = " <<<" if a != b else ""
            print(f"{a[0]:5d}  {a[1:]}  {b[1:]}{mark}")
