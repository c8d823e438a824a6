"""Shadow A/B on the circuit: at every keyframe, replay the two-phase
path on a pre-state clone and diff against the shipped merged dispatch.

Reports per-keyframe: created-point symmetric difference, kp->mp cell
divergence, and median created-point depth under both paths — locates
the first material divergence behind the merged-mapping scale collapse
(tools/diag_scale_drift.py).
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


def main(seed: int = 2, n_frames: int = 100):
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
    lm = swarm.agents[0].system.local_mapping
    assert lm._merged_mapping

    orig_merged = LocalMapping._create_and_fuse

    def med_depth(st, k, pre):
        mps = st.kf_kp_mp[k]
        new = mps[mps >= pre]
        if not len(new):
            return float("nan")
        pw = st.mp_pos[new]
        pc = (st.kf_pose_cw[k, :3, :3] @ pw.T).T + st.kf_pose_cw[k, :3, 3]
        return float(np.median(pc[:, 2]))

    def merged(self, k, *a, **kw):
        cl = self.store.clone()
        cl.log_fn = None
        pre = self.store.n_mp
        orig_merged(self, k, *a, **kw)
        lm2 = LocalMapping(cl, self.settings)
        lm2._create_new_map_points(k)
        lm2._fuse_neighbors(k)
        st = self.store
        made_a = {i for i in range(st.n_kp) if st.kf_kp_mp[k, i] >= pre}
        made_b = {i for i in range(cl.n_kp) if cl.kf_kp_mp[k, i] >= pre}
        ra = st.kf_kp_mp[: st.n_kf].copy()
        rb = cl.kf_kp_mp[: st.n_kf].copy()
        ra[ra >= pre] = -2
        rb[rb >= pre] = -3
        cells = int(((ra != rb) & ~((ra == -2) & (rb == -3))).sum())
        da, db = med_depth(st, k, pre), med_depth(cl, k, pre)
        sym = len(made_a ^ made_b)
        flag = " <<<" if (sym or cells > 2) else ""
        print(f"kf {k:3d}: created A={len(made_a):3d} B={len(made_b):3d} "
              f"sym={sym:3d} cells={cells:4d} "
              f"depthA={da:7.3f} depthB={db:7.3f}{flag}", flush=True)

    LocalMapping._create_and_fuse = merged
    try:
        for i in range(n_frames):
            swarm.agents[0].track(seq.read(i), float(seq.timestamps[i]))
            swarm.frame_count += 1
            if swarm.frame_count % 10 == 0:
                swarm.sync()
    finally:
        LocalMapping._create_and_fuse = orig_merged
    swarm.finish()
    lc = swarm.mediators[0].loop_closing
    print(f"loops={lc.n_loops_closed}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
