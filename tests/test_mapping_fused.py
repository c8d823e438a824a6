"""Merged triangulate+fuse dispatch (ROADMAP perf #2) vs the two-phase
path: one device round trip per keyframe must not change the quality or
economy of the map the worker builds (reference runs CreateNewMapPoints
then SearchInNeighbors as sequential host phases, LocalMapping.cc:70-76).

Exact structural equality between the two paths is NOT attainable: the
merged program fuses XLA ops differently than the standalone dispatches
(last-ulp differences in projected u/v and search radii flip
window-boundary matches), and integer Hamming ties resolve by candidate
array position, which the two layouts order differently.  A multi-seed
sweep (seeds 3/5/7/11) shows the residual divergence is unbiased noise:
merged is fatter on one seed, leaner on two, equal on one, with equal or
better ATE throughout.  The assertions below are therefore quality and
economy bounds, not bit-equality.

A 3-seed circuit study (100-frame revisit loops) showed the residual
divergence can still flip marginal outcomes (2/3 seeds lost a loop
closure in merged mode), so merged is OPT-IN
(SWARMMAP_MERGED_MAPPING=1 / LocalMapping._merged_mapping) and the
two-phase path is the default this suite gates on elsewhere."""
import numpy as np
import pytest

from swarmmap_tpu.core.system import System
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings
from swarmmap_tpu.utils.trajectory import ate_rmse


def _run(merged_mapping: bool):
    hw = (240, 320)
    seq = datasets.synthesize_sequence(
        n_frames=40, hw=hw, seed=3, n_points=350, motion="arc"
    )
    w = seq.world
    s = Settings(
        camera=CameraConfig(
            fx=float(w.K[0, 0]), fy=float(w.K[1, 1]),
            cx=float(w.K[0, 2]), cy=float(w.K[1, 2]),
            fps=20.0, width=hw[1], height=hw[0],
        ),
        orb=OrbConfig(n_features=400, n_levels=4),
    )
    sys = System(s)
    sys.local_mapping._merged_mapping = merged_mapping
    poses = {}
    for i in range(len(seq)):
        T = sys.track_monocular(seq.read(i), seq.timestamps[i])
        if T is not None:
            poses[i] = T
    idx = sorted(poses)
    est = np.stack([np.linalg.inv(poses[i]) for i in idx])
    gt = seq.world.poses_wc[idx]
    gt_t = gt[:, :3, 3]
    span = float(np.linalg.norm(gt_t.max(0) - gt_t.min(0)))
    return sys, poses, ate_rmse(est[:, :3, 3], gt_t) / max(span, 1e-9)


@pytest.fixture(scope="module")
def both_paths():
    return _run(merged_mapping=True), _run(merged_mapping=False)


def test_merged_path_tracks_equally(both_paths):
    (sys_m, poses_m, _), (sys_s, poses_s, _) = both_paths
    # every frame the two-phase path tracks, the merged path tracks too
    assert len(poses_m) == len(poses_s)
    assert sys_m.n_keyframes() == pytest.approx(sys_s.n_keyframes(), abs=4)


def test_merged_path_comparable_map_economy(both_paths):
    (sys_m, _, _), (sys_s, _, _) = both_paths
    n_m, n_s = sys_m.n_map_points(), sys_s.n_map_points()
    assert n_m == pytest.approx(n_s, rel=0.25), (n_m, n_s)
    # duplicates that escaped fusing would show up as fewer observations
    # per surviving point
    obs_m = sum(len(v) for v in sys_m.store.obs.values())
    obs_s = sum(len(v) for v in sys_s.store.obs.values())
    assert obs_m / max(n_m, 1) == pytest.approx(
        obs_s / max(n_s, 1), rel=0.25
    ), (obs_m / n_m, obs_s / n_s)


def test_merged_path_same_accuracy(both_paths):
    (_, _, ate_m), (_, _, ate_s) = both_paths
    # both relative to trajectory span
    assert ate_m < 0.05
    assert abs(ate_m - ate_s) < 0.02
