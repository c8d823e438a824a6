"""Measure per-keyframe scale drift vs ground truth on the circuit.

The merged-mapping loop regression shows Sim3 RANSAC estimating s~0.05
between loop endpoints; this tool checks whether the CLIENT map's scale
drifts along the trajectory (ratio of estimated to ground-truth
inter-keyframe translation), merged vs two-phase.
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
    for i in range(n_frames):
        swarm.agents[0].track(seq.read(i), float(seq.timestamps[i]))
        swarm.frame_count += 1
        if swarm.frame_count % 10 == 0:
            swarm.sync()
    swarm.finish()
    st = swarm.agents[0].system.store
    alive = np.where(st.kf_alive[: st.n_kf])[0]
    # estimated camera centers
    T = st.kf_pose_cw[alive]
    c_est = -np.einsum("kij,kj->ki", T[:, :3, :3].transpose(0, 2, 1),
                       T[:, :3, 3])
    ts = st.kf_ts[alive]
    # ground-truth centers at those timestamps
    fidx = np.clip(np.round(ts / 0.05).astype(int), 0, n_frames - 1)
    c_gt = w.poses_wc[fidx, :3, 3]
    # per-segment scale ratio (est / gt), windowed over 5 KFs
    print(f"\nmerged={merged}: {len(alive)} KFs")
    print(" kf   frame   seg_scale(est/gt, win5)   med_depth")
    for i in range(5, len(alive), 5):
        d_est = np.linalg.norm(c_est[i] - c_est[i - 5])
        d_gt = np.linalg.norm(c_gt[i] - c_gt[i - 5])
        r = d_est / max(d_gt, 1e-9)
        # median depth of points observed by this KF
        k = int(alive[i])
        mps = st.kf_kp_mp[k]
        mps = mps[mps >= 0]
        mps = mps[st.mp_alive[mps]]
        if len(mps):
            pw = st.mp_pos[mps]
            pc = (st.kf_pose_cw[k, :3, :3] @ pw.T).T + st.kf_pose_cw[k, :3, 3]
            md = float(np.median(pc[:, 2]))
        else:
            md = float("nan")
        print(f"{k:4d} {fidx[i]:6d}   {r:10.4f}              {md:8.3f}")
    return None


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    run(True, seed)
    run(False, seed)
