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


def test_client_save_load_map_relocalizes(tmp_path):
    """System.SaveMap/LoadMap (reference: System.cc:349,370): a client
    saves its map, a FRESH client loads it and relocalizes against it —
    the reference's map-reuse workflow (README.md:181-183)."""
    from swarmmap_tpu.core.frame import build_frame

    hw = (240, 320)
    seq = datasets.synthesize_sequence(
        n_frames=40, hw=hw, seed=0, n_points=350, motion="arc")
    world = seq.world
    s = small_settings(hw)
    s.camera.fx = float(world.K[0, 0])
    s.camera.fy = float(world.K[1, 1])
    s.camera.cx = float(world.K[0, 2])
    s.camera.cy = float(world.K[1, 2])
    sys1 = System(s)
    for i in range(len(seq)):
        sys1.track_monocular(seq.read(i), seq.timestamps[i])
    assert sys1.n_keyframes() >= 3
    path = tmp_path / "map-client-0.bin"
    sys1.save_map(path)
    assert path.exists() and path.stat().st_size > 0

    sys2 = System(s)
    assert not sys2.load_map(tmp_path / "missing.bin")  # fresh-start path
    assert sys2.load_map(path)
    assert sys2.n_keyframes() == sys1.n_keyframes()
    assert sys2.n_map_points() == sys1.n_map_points()
    # the loaded map relocalizes a mid-sequence frame (keyframe database
    # was rebuilt on load, reference: the ComputeBoW loop in LoadMap)
    ok = 0
    for i in (10, 20, 30):
        frame = build_frame(seq.read(i), float(seq.timestamps[i]),
                            s.camera, s.orb)
        ok += bool(sys2.tracking._relocalize(frame))
    assert ok >= 2, f"relocalized only {ok}/3 frames against the loaded map"


def test_distorted_camera_takes_fused_path_same_ate():
    """A calibrated (distorted) camera must run the FUSED tracking
    program — undistortion happens inside pipeline.tracking_step — with
    accuracy comparable to the distortion-free run.  Regression for the
    round-3 gap: `fused_eligible` demanded dist==0, so EuRoC's k1=-0.283
    pushed every frame onto the staged multi-dispatch path."""
    hw = (240, 320)
    dist = np.array([-0.28, 0.07, 1.9e-4, 1.8e-5, 0.0], np.float32)
    results = {}
    for name, d in (("pinhole", None), ("distorted", dist)):
        seq = datasets.synthesize_sequence(
            n_frames=40, hw=hw, seed=0, n_points=350, motion="arc", dist=d)
        world = seq.world
        s = small_settings(hw)
        s.camera.fx = float(world.K[0, 0])
        s.camera.fy = float(world.K[1, 1])
        s.camera.cx = float(world.K[0, 2])
        s.camera.cy = float(world.K[1, 2])
        if d is not None:
            s.camera.k1, s.camera.k2 = float(d[0]), float(d[1])
            s.camera.p1, s.camera.p2 = float(d[2]), float(d[3])
        sys = System(s)
        poses = {}
        for i in range(len(seq)):
            T = sys.track_monocular(seq.read(i), seq.timestamps[i])
            if T is not None:
                poses[i] = T
        idx = sorted(poses)
        est_t = np.stack([np.linalg.inv(poses[i])[:3, 3] for i in idx])
        gt_t = world.poses_wc[idx][:, :3, 3]
        span = np.linalg.norm(gt_t.max(0) - gt_t.min(0))
        results[name] = dict(
            tracked=len(poses), fused=sys.tracking.fused_frames,
            ate_pct=ate_rmse(est_t, gt_t) / span * 100.0,
        )
    r = results["distorted"]
    assert r["tracked"] >= 0.6 * 40, r
    # the flagship path actually ran on the calibrated camera
    assert r["fused"] >= 0.5 * r["tracked"], r
    assert r["ate_pct"] < 5.0, r
    # accuracy comparable to the pinhole run (same world, same seed)
    assert r["ate_pct"] < results["pinhole"]["ate_pct"] + 2.0, results
