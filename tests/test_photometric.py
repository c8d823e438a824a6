"""Photometric robustness (round-3 verdict, real-dataset de-risking):
rendered sequences degraded with sensor noise, motion blur, and
vignetting run through the FULL extraction -> tracking loop with ATE
assertions — the failure modes real imagery adds over clean renders."""
import numpy as np
import pytest

from swarmmap_tpu.core.system import System
from swarmmap_tpu.core.tracking import TrackingState
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings
from swarmmap_tpu.utils.trajectory import ate_rmse

HW = (240, 320)
N_FRAMES = 40


def _degrade(img, mode, rng):
    x = img.astype(np.float32)
    if mode == "noise":
        # sensor read noise, sigma ~6 gray levels (dim EuRoC corridors)
        x = x + rng.normal(0, 6.0, x.shape)
    elif mode == "blur":
        # horizontal motion blur, 5 px box kernel
        from scipy.ndimage import uniform_filter1d

        x = uniform_filter1d(x, size=5, axis=1)
    elif mode == "vignette":
        h, w = x.shape
        yy, xx = np.mgrid[0:h, 0:w]
        r2 = ((xx - w / 2) / (w / 2)) ** 2 + ((yy - h / 2) / (h / 2)) ** 2
        x = x * (1.0 - 0.45 * np.clip(r2, 0, 1))
    elif mode == "combined":
        from scipy.ndimage import uniform_filter1d

        h, w = x.shape
        yy, xx = np.mgrid[0:h, 0:w]
        r2 = ((xx - w / 2) / (w / 2)) ** 2 + ((yy - h / 2) / (h / 2)) ** 2
        x = uniform_filter1d(x, size=3, axis=1)
        x = x * (1.0 - 0.3 * np.clip(r2, 0, 1)) + rng.normal(0, 4.0, x.shape)
    return np.clip(x, 0, 255).astype(np.uint8)


def _run(mode):
    seq = datasets.synthesize_sequence(
        n_frames=N_FRAMES, hw=HW, seed=0, n_points=350, motion="arc")
    world = seq.world
    h, w = HW
    s = Settings(
        camera=CameraConfig(
            fx=float(world.K[0, 0]), fy=float(world.K[1, 1]),
            cx=float(world.K[0, 2]), cy=float(world.K[1, 2]),
            fps=20.0, width=w, height=h),
        orb=OrbConfig(n_features=400, n_levels=4),
    )
    rng = np.random.RandomState(9)
    sys_ = System(s)
    poses = {}
    for i in range(len(seq)):
        img = _degrade(seq.read(i), mode, rng)
        T = sys_.track_monocular(img, seq.timestamps[i])
        if T is not None:
            poses[i] = T
    idx = sorted(poses)
    est_t = np.stack([np.linalg.inv(poses[i])[:3, 3] for i in idx])
    gt_t = world.poses_wc[idx][:, :3, 3]
    span = np.linalg.norm(gt_t.max(0) - gt_t.min(0))
    return sys_, len(poses), ate_rmse(est_t, gt_t) / span * 100.0


@pytest.mark.parametrize("mode", ["noise", "blur", "vignette", "combined"])
def test_degraded_sequence_tracks_with_bounded_ate(mode):
    sys_, tracked, ate_pct = _run(mode)
    assert sys_.state == TrackingState.OK, mode
    assert tracked >= 0.6 * N_FRAMES, f"{mode}: tracked {tracked}/{N_FRAMES}"
    assert ate_pct < 5.0, f"{mode}: ATE {ate_pct:.2f}% of span"
