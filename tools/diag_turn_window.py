"""Per-frame microscope on the circuit's collapse window (frames 50-75).

For each frame: tracker inliers, per-frame motion scale (est step length
/ gt step length), and for each new keyframe the median depth + count of
created points — pinpoints where the tracker/mapper starts sliding.
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
    sysm = swarm.agents[0].system
    sysm.local_mapping._merged_mapping = merged
    st = sysm.store
    tr = sysm.tracking

    prev_c = None
    print(f"\n=== merged={merged} seed={seed} ===")
    print("frm  inl  nkf  step_scale  kf_created(depth)")
    for i in range(n_frames):
        pre_kf = st.n_kf
        pre_mp = st.n_mp
        T = swarm.agents[0].track(seq.read(i), float(seq.timestamps[i]))
        swarm.frame_count += 1
        if swarm.frame_count % 10 == 0:
            swarm.sync()
        msg = ""
        if T is not None:
            c = -T[:3, :3].T @ T[:3, 3]
            if prev_c is not None:
                d_est = np.linalg.norm(c - prev_c[0])
                d_gt = np.linalg.norm(
                    w.poses_wc[i, :3, 3] - w.poses_wc[prev_c[1], :3, 3])
                msg = f"{d_est / max(d_gt, 1e-9):8.4f}"
            prev_c = (c, i)
        else:
            msg = "   LOST "
        kfmsg = ""
        if st.n_kf > pre_kf:
            k = st.n_kf - 1
            mps = st.kf_kp_mp[k]
            new = mps[mps >= pre_mp]
            if len(new):
                pw = st.mp_pos[new]
                pc = (st.kf_pose_cw[k, :3, :3] @ pw.T).T + st.kf_pose_cw[k, :3, 3]
                kfmsg = (f"kf{k} +{len(new)}pts med_z="
                         f"{float(np.median(pc[:, 2])):.3f}")
            else:
                kfmsg = f"kf{k} +0pts"
        if 45 <= i <= 80 or kfmsg:
            print(f"{i:3d}  {tr.matches_inliers:3d}  {st.n_kf:3d}  {msg:8s}  {kfmsg}",
                  flush=True)
    swarm.finish()
    lc = swarm.mediators[0].loop_closing
    print(f"loops={lc.n_loops_closed}")


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    run(True, seed)
    run(False, seed)
