"""Real-dataset day-1 dress rehearsal (SURVEY.md §7.4, round-3 verdict):
the COMMITTED `config/mh123.yaml` — the reference's 3-agent EuRoC
MH01-03 headline configuration — resolves through an on-disk fake-EuRoC
tree into a full 3-agent Swarm run, with frames rendered through the
EXACT EuRoC cam0 calibration (incl. k1=-0.28 radial distortion) from
`config/settings/EuRoC.yaml`.  On real hardware, only $SWARMMAP_DATA
changes."""
import numpy as np
import pytest

from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import Settings

cv2 = pytest.importorskip("cv2")

N_FRAMES = 25
SEQ_NAMES = ["MH_01_easy", "MH_02_easy", "MH_03_medium"]  # mh123.yaml IMAGES


def _render_fake_euroc(data_root, settings: Settings):
    """Three EuRoC-layout sequences rendered with the EuRoC calibration
    on one shared world (offset trajectories -> overlapping maps)."""
    hw = (settings.camera.height, settings.camera.width)
    worlds = []
    for a, name in enumerate(SEQ_NAMES):
        w = datasets.make_world(n_points=500, n_frames=N_FRAMES, hw=hw,
                                seed=5, agent=a, motion="arc")
        # the rendered lens must MATCH the settings the tracker loads
        w.K = settings.camera.K.astype(np.float64)
        w.dist = settings.camera.dist.astype(np.float32)
        cam = data_root / name / "mav0" / "cam0" / "data"
        cam.mkdir(parents=True)
        for i in range(N_FRAMES):
            ns = 1403636579763555584 + int(5e7) * i
            cv2.imwrite(str(cam / f"{ns}.png"), datasets.render_frame(w, i))
        worlds.append(w)
    return worlds


def test_mh123_config_resolves_into_3agent_swarm(tmp_path, monkeypatch):
    """config/mh123.yaml -> EuRoC.yaml settings -> fake on-disk EuRoC
    trees -> 3-agent combined-mode run that really tracks, with the
    distorted camera on the FUSED path (undistortion inside the fused
    program) and sub-5% per-agent ATE against the rendered ground truth."""
    from swarmmap_tpu.cli import swarm_map

    settings = Settings.load("config/settings/EuRoC.yaml")
    assert abs(settings.camera.k1 + 0.28340811) < 1e-6  # the hard part
    data = tmp_path / "data"
    worlds = _render_fake_euroc(data, settings)
    monkeypatch.setenv("SWARMMAP_DATA", str(data))
    out = tmp_path / "out"
    swarm = swarm_map.main([
        "-d", "config/mh123.yaml", "-c", "3", "--features", "300",
        "-o", str(out), "-l", "warning",
    ])
    for a, (agent, w) in enumerate(zip(swarm.agents, worlds)):
        tr = agent.system.tracking
        assert agent.frames_tracked >= 0.6 * N_FRAMES, (
            f"agent {a} tracked {agent.frames_tracked}/{N_FRAMES}")
        # the calibrated camera must run the flagship fused program
        assert tr.fused_frames >= 0.3 * agent.frames_tracked, (
            f"agent {a}: only {tr.fused_frames} fused of "
            f"{agent.frames_tracked} tracked")
        # ATE vs rendered ground truth (monocular scale via Sim3 align)
        from swarmmap_tpu.utils.trajectory import umeyama_align

        traj = tr.trajectory
        assert len(traj) >= 10
        est = np.stack([T[:3, 3] for _, T in traj])
        ts0 = 1403636579763555584 / 1e9  # first rendered frame stamp
        idx = [min(int(round((t - ts0) / 0.05)), N_FRAMES - 1)
               for t, _ in traj]
        gt = w.poses_wc[idx][:, :3, 3]
        s, R, t = umeyama_align(est, gt)
        resid = np.linalg.norm(est @ (s * R).T + t - gt, axis=1)
        span = np.linalg.norm(gt.max(0) - gt.min(0))
        ate = float(np.sqrt((resid ** 2).mean()))
        assert ate < 0.05 * span, (
            f"agent {a}: ATE {ate:.3f} vs span {span:.2f}")
    # trajectory outputs landed where the reference writes them
    assert (out / "KeyFrameTrajectory-client-0.txt").exists()
