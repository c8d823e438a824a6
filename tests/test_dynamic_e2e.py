"""End-to-end proof of the dynamic-object subsystem (VERDICT r4 #8).

A rigid flock of striped patches drifts through the near field of an
otherwise-static synthetic world (reference scenario: a vehicle crossing
the camera path, DynamicExtractor.cc).  Its coherent motion biases the
pose estimate when the points are tracked; with the shipped appearance
segmenter (data/dyn_segmenter.npz) voting keyframe observations dynamic
(MapPoint.h:129-132 analogue), the tracker must reject the flock and
recover a measurably better trajectory.
"""
import numpy as np
import pytest

from swarmmap_tpu.core.system import System
from swarmmap_tpu.core.tracking import TrackingParams
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings
from swarmmap_tpu.utils.trajectory import ate_rmse

HW = (240, 320)
N_FRAMES = 40
N_DYNAMIC = 60


def _run(dynamic: bool) -> tuple[float, int, int]:
    seq = datasets.synthesize_sequence(
        n_frames=N_FRAMES, hw=HW, seed=5, n_points=350, motion="arc",
        n_dynamic=N_DYNAMIC,
    )
    w = seq.world
    s = Settings(
        camera=CameraConfig(fx=float(w.K[0, 0]), fy=float(w.K[1, 1]),
                            cx=float(w.K[0, 2]), cy=float(w.K[1, 2]),
                            fps=20.0, width=HW[1], height=HW[0]),
        orb=OrbConfig(n_features=600, n_levels=4),
    )
    tp = TrackingParams(dynamic_filter=dynamic,
                        dynamic_segment="conv" if dynamic else None)
    sysm = System(s, tracking_params=tp)
    for i in range(len(seq)):
        sysm.track_monocular(seq.read(i), seq.timestamps[i])
    sysm.shutdown()
    tr = sysm.tracking.trajectory
    ts = np.array([t for t, _ in tr])
    est = np.stack([T[:3, 3] for _, T in tr])
    gt = w.poses_wc[np.round(ts * 20).astype(int)][:, :3, 3]
    flagged = 0
    if sysm.tracking.dynamic is not None:
        st = sysm.store
        flagged = int(sysm.tracking.dynamic.votes.is_dynamic(
            np.arange(st.n_mp)).sum())
    return ate_rmse(est, gt), len(tr), flagged


def test_segmenter_rejects_moving_flock():
    ate_off, frames_off, _ = _run(False)
    ate_on, frames_on, flagged = _run(True)
    # both runs must actually track the sequence
    assert frames_off >= N_FRAMES - 5
    assert frames_on >= N_FRAMES - 5
    # the segmenter voted a meaningful share of flock points dynamic
    assert flagged >= 10, flagged
    # the flock measurably corrupts the unfiltered run, and filtering
    # recovers a clearly better trajectory
    assert ate_on < ate_off, (ate_on, ate_off)
    assert ate_on < 0.7 * ate_off, (ate_on, ate_off)


def test_segmenter_center_accuracy():
    """The shipped conv segmenter must classify keypoint CENTERS (the
    corner disks, its hardest pixels): >=60% recall on flock patch
    centers, <=5% false positives on static landmark centers."""
    from swarmmap_tpu.core.dynamic import load_segmenter

    seg = load_segmenter()
    w = datasets.make_world(n_points=350, n_frames=6, hw=HW, seed=11,
                            motion="arc", n_dynamic=60)
    hits_d = tot_d = hits_s = tot_s = 0
    for i in range(6):
        img, mask_gt = datasets.render_frame(w, i, return_dyn_mask=True)
        m = seg(img)
        T = w.poses_wc[i]
        R_cw = T[:3, :3].T
        t_cw = -R_cw @ T[:3, 3]
        for pts, is_dyn in ((w.dyn_at(i), True), (w.points, False)):
            pc = pts @ R_cw.T + t_cw
            z = pc[:, 2]
            uv = (pc[:, :2] / np.maximum(z[:, None], 1e-6)) @ np.diag(
                [w.K[0, 0], w.K[1, 1]]) + w.K[:2, 2]
            for j in range(len(pts)):
                u, v = int(round(uv[j, 0])), int(round(uv[j, 1]))
                if z[j] <= 0.3 or not (8 <= u < HW[1] - 8
                                       and 8 <= v < HW[0] - 8):
                    continue
                if not is_dyn and mask_gt[v, u]:
                    continue  # static landmark occluded by the flock
                hit = bool(m[v - 1: v + 2, u - 1: u + 2].any())
                if is_dyn:
                    tot_d += 1
                    hits_d += hit
                else:
                    tot_s += 1
                    hits_s += hit
    assert hits_d / max(tot_d, 1) >= 0.6, (hits_d, tot_d)
    assert hits_s / max(tot_s, 1) <= 0.05, (hits_s, tot_s)
