"""Log client map scale before/after every server distribute on the
circuit — tests whether the server GBA -> DistributeMap feedback loop
drives the merged-run scale collapse (tools/diag_scale_drift.py).
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

    st = swarm.agents[0].system.store

    def tail_scale():
        alive = np.where(st.kf_alive[: st.n_kf])[0]
        if len(alive) < 6:
            return float("nan")
        T = st.kf_pose_cw[alive]
        c_est = -np.einsum("kij,kj->ki", T[:, :3, :3].transpose(0, 2, 1),
                           T[:, :3, 3])
        ts = st.kf_ts[alive]
        fidx = np.clip(np.round(ts / 0.05).astype(int), 0, n_frames - 1)
        c_gt = w.poses_wc[fidx, :3, 3]
        d_est = np.linalg.norm(c_est[-1] - c_est[-6])
        d_gt = np.linalg.norm(c_gt[-1] - c_gt[-6])
        return d_est / max(d_gt, 1e-9)

    agent = swarm.agents[0]
    orig_recv = type(agent).receive_distribute

    def recv(self, *a, **kw):
        pre = tail_scale()
        out = orig_recv(self, *a, **kw)
        post = tail_scale()
        print(f"  distribute: tail scale {pre:.4f} -> {post:.4f}"
              f"{'  <<<' if abs(post - pre) / max(pre, 1e-9) > 0.05 else ''}",
              flush=True)
        return out

    type(agent).receive_distribute = recv
    try:
        for i in range(n_frames):
            agent.track(seq.read(i), float(seq.timestamps[i]))
            swarm.frame_count += 1
            if swarm.frame_count % 10 == 0:
                print(f"frame {i}: tail scale {tail_scale():.4f}", flush=True)
                swarm.sync()
    finally:
        type(agent).receive_distribute = orig_recv
    swarm.finish()
    lc = swarm.mediators[0].loop_closing
    print(f"merged={merged}: loops={lc.n_loops_closed}")


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    run(True, seed)
