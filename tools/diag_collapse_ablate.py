"""Ablate pipeline stages on a collapsing circuit run to find which
feedback loop drives the monocular scale runaway (seed 11, merged).

Variants: full, no server GBA, no local BA, neither.
Prints final tail scale + loop count per variant.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms",
                  os.environ.get("SWARMMAP_DIAG_PLATFORM", "cpu"))
from swarmmap_tpu.utils.compile_cache import configure as _configure_cache

_configure_cache(jax, platform=None)  # platform set above; cache keyed by host

from swarmmap_tpu.core.local_mapping import LocalMapping
from swarmmap_tpu.swarm import Swarm, SwarmConfig
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings


def run(merged: bool, seed: int, local_ba: bool, server_gba: bool,
        n_frames: int = 100):
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
                  run_server_gba=server_gba)
    swarm.agents[0].system.local_mapping._merged_mapping = merged
    if not local_ba:
        swarm.agents[0].system.local_mapping._local_ba = (
            lambda *a, **kw: None)
    st = swarm.agents[0].system.store
    for i in range(n_frames):
        swarm.agents[0].track(seq.read(i), float(seq.timestamps[i]))
        swarm.frame_count += 1
        if swarm.frame_count % 10 == 0:
            swarm.sync()
    swarm.finish()
    alive = np.where(st.kf_alive[: st.n_kf])[0]
    T = st.kf_pose_cw[alive]
    c_est = -np.einsum("kij,kj->ki", T[:, :3, :3].transpose(0, 2, 1),
                       T[:, :3, 3])
    ts = st.kf_ts[alive]
    fidx = np.clip(np.round(ts / 0.05).astype(int), 0, n_frames - 1)
    c_gt = w.poses_wc[fidx, :3, 3]
    scales = []
    for i in range(5, len(alive), 5):
        d_est = np.linalg.norm(c_est[i] - c_est[i - 5])
        d_gt = np.linalg.norm(c_gt[i] - c_gt[i - 5])
        scales.append(d_est / max(d_gt, 1e-9))
    lc = swarm.mediators[0].loop_closing
    s0 = np.mean(scales[:3]) if len(scales) >= 3 else float("nan")
    s1 = np.mean(scales[-3:]) if len(scales) >= 3 else float("nan")
    print(f"merged={merged} local_ba={local_ba} gba={server_gba}: "
          f"kfs={len(alive)} loops={lc.n_loops_closed} "
          f"scale start={s0:.4f} end={s1:.4f} ratio={s1 / max(s0, 1e-9):.3f}",
          flush=True)


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    run(True, seed, True, True)
    run(True, seed, True, False)
    run(True, seed, False, True)
    run(True, seed, False, False)
