"""End-to-end single-agent SLAM on the synthetic world, with ATE checks
(SURVEY.md §4: 'dataset replay as integration test' + evo-style ATE)."""
import numpy as np
import pytest

from swarmmap_tpu.core.system import System
from swarmmap_tpu.core.tracking import TrackingState
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings
from swarmmap_tpu.utils.trajectory import ate_rmse


def small_settings(hw=(240, 320), fps=20.0):
    h, w = hw
    return Settings(
        camera=CameraConfig(fx=230.0, fy=230.0, cx=w / 2.0, cy=h / 2.0,
                            fps=fps, width=w, height=h),
        orb=OrbConfig(n_features=400, n_levels=4),
    )


@pytest.fixture(scope="module")
def slam_run():
    """One tracked synthetic sequence shared by the checks below."""
    hw = (240, 320)
    seq = datasets.synthesize_sequence(
        n_frames=40, hw=hw, seed=0, n_points=350, motion="arc"
    )
    # camera in the renderer uses K from make_world: f=460/2? -> match it
    world = seq.world
    s = small_settings(hw)
    s.camera.fx = float(world.K[0, 0])
    s.camera.fy = float(world.K[1, 1])
    s.camera.cx = float(world.K[0, 2])
    s.camera.cy = float(world.K[1, 2])
    sys = System(s)
    poses = {}
    for i in range(len(seq)):
        T = sys.track_monocular(seq.read(i), seq.timestamps[i])
        if T is not None:
            poses[i] = T
    return sys, seq, poses


def test_initializes_and_tracks(slam_run):
    sys, seq, poses = slam_run
    assert sys.state == TrackingState.OK
    assert len(poses) >= 0.6 * len(seq), f"tracked only {len(poses)}/{len(seq)}"


def test_map_grows(slam_run):
    sys, _, _ = slam_run
    assert sys.n_keyframes() >= 3
    assert sys.n_map_points() > 100


def test_trajectory_accuracy(slam_run):
    sys, seq, poses = slam_run
    gt = seq.world.poses_wc
    idx = sorted(poses)
    est_t = np.stack([np.linalg.inv(poses[i])[:3, 3] for i in idx])
    gt_t = gt[idx][:, :3, 3]
    rmse = ate_rmse(est_t, gt_t)
    # trajectory spans ~4.5m; demand sub-5% ATE
    span = np.linalg.norm(gt_t.max(0) - gt_t.min(0))
    assert rmse < 0.05 * span, f"ATE {rmse:.3f} vs span {span:.2f}"


def test_trajectory_io(tmp_path, slam_run):
    sys, _, _ = slam_run
    p = tmp_path / "kf.txt"
    sys.save_keyframe_trajectory_tum(p)
    txt = p.read_text().strip().splitlines()
    assert len(txt) == sys.n_keyframes()
    assert len(txt[0].split()) == 8


def test_html_viewer_export(tmp_path, slam_run):
    """The Pangolin-analogue HTML viewer embeds the full scene."""
    sys, seq, poses = slam_run
    from swarmmap_tpu.viz.html_viewer import export_html

    out = tmp_path / "map.html"
    export_html(sys.store, out, title="e2e map")
    html = out.read_text()
    assert html.startswith("<!DOCTYPE html>")
    assert "SCENE" in html and '"points"' in html and '"traj"' in html
    # scene contains real geometry
    import json
    import re

    scene = json.loads(re.search(r"const SCENE = (\{.*?\});\n", html).group(1))
    assert len(scene["maps"]) == 1
    assert len(scene["maps"][0]["points"]) > 100
    assert len(scene["maps"][0]["traj"]) >= 2
    assert scene["radius"] > 0


def _run_with_dropout(recently_lost_frames):
    """Track a sequence with a 3-frame featureless dropout in the middle."""
    from swarmmap_tpu.core.tracking import TrackingParams

    hw = (240, 320)
    seq = datasets.synthesize_sequence(
        n_frames=36, hw=hw, seed=0, n_points=350, motion="arc"
    )
    world = seq.world
    s = small_settings(hw)
    s.camera.fx = float(world.K[0, 0])
    s.camera.fy = float(world.K[1, 1])
    s.camera.cx = float(world.K[0, 2])
    s.camera.cy = float(world.K[1, 2])
    sys = System(s, tracking_params=TrackingParams(
        recently_lost_frames=recently_lost_frames))
    blank = np.full(hw, 40, np.uint8)  # no corners: every stage fails
    ever_lost = False
    for i in range(len(seq)):
        img = blank if 22 <= i < 25 else seq.read(i)
        sys.track_monocular(img, seq.timestamps[i])
        ever_lost = ever_lost or sys.state == TrackingState.LOST
    return sys, ever_lost


def test_recently_lost_grace_recovers():
    """A transient feature dropout is bridged by the RECENTLY_LOST
    motion-model grace window: the tracker re-acquires when features
    return instead of dropping to relocalization."""
    sys, ever_lost = _run_with_dropout(recently_lost_frames=40)
    assert not ever_lost
    assert sys.state == TrackingState.OK
    assert sys.tracking.grace == 0  # fully re-acquired, not coasting


def test_recently_lost_disabled_matches_reference():
    """recently_lost_frames=0 restores the reference's immediate-LOST
    semantics (ORB-SLAM2 Tracking.cc: <30 local-map inliers -> LOST)."""
    _sys, ever_lost = _run_with_dropout(recently_lost_frames=0)
    # the dropout forced at least one hard LOST transition
    assert ever_lost
