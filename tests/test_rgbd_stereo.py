"""RGB-D and stereo sensor paths: metric-scale tracking on the synthetic
world (reference public API: TrackRGBD / TrackStereo, System.h:52-123)."""
import numpy as np
import pytest

from swarmmap_tpu.core.system import System
from swarmmap_tpu.core.tracking import TrackingState
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings


def make_settings(world, hw):
    return Settings(
        camera=CameraConfig(
            fx=float(world.K[0, 0]), fy=float(world.K[1, 1]),
            cx=float(world.K[0, 2]), cy=float(world.K[1, 2]),
            fps=20.0, width=hw[1], height=hw[0],
        ),
        orb=OrbConfig(n_features=400, n_levels=4),
    )


def test_rgbd_tracks_metric_scale():
    hw = (240, 320)
    n = 25
    world = datasets.make_world(n_points=350, n_frames=n, hw=hw, seed=4)
    settings = make_settings(world, hw)
    sys_ = System(settings)
    poses = {}
    for i in range(n):
        img, depth = datasets.render_frame(world, i, return_depth=True)
        T = sys_.track_rgbd(img, depth, i / 20.0)
        if T is not None:
            poses[i] = T
    assert sys_.state == TrackingState.OK
    assert len(poses) > 0.8 * n
    # metric scale: NO scale alignment — relative-to-first-frame
    # translations must match absolutely (SLAM origin = first camera)
    idx = sorted(poses)
    Te0 = np.linalg.inv(poses[idx[0]])  # Twc of first tracked frame
    Tg0 = world.poses_wc[idx[0]]
    errs = []
    for i in idx:
        e = np.linalg.inv(Te0) @ np.linalg.inv(poses[i])   # first-cam frame
        g = np.linalg.inv(Tg0) @ world.poses_wc[i]
        errs.append(np.linalg.norm(e[:3, 3] - g[:3, 3]))
    assert np.median(errs) < 0.05, np.median(errs)


def test_stereo_depths_accuracy():
    import jax.numpy as jnp

    from swarmmap_tpu.ops import extractor as ex, stereo

    hw = (240, 320)
    world = datasets.make_world(n_points=350, n_frames=4, hw=hw, seed=4)
    left, right = datasets.render_stereo_pair(world, 0, baseline=0.12)
    fL = ex.extract_orb(jnp.asarray(left), n_features=400, n_levels=4)
    fR = ex.extract_orb(jnp.asarray(right), n_features=400, n_levels=4)
    d = np.asarray(stereo.stereo_depths(
        fL.xy, fL.desc, fL.octave, fL.valid,
        fR.xy, fR.desc, fR.octave, fR.valid,
        fx=float(world.K[0, 0]), baseline=0.12,
    ))
    # compare matched depths against the rendered depth map
    _, depth_gt = datasets.render_frame(world, 0, return_depth=True)
    xy = np.asarray(fL.xy)
    ok = d > 0
    assert ok.sum() > 50, f"only {ok.sum()} stereo matches"
    errs = []
    for i in np.where(ok)[0]:
        x, y = int(round(xy[i, 0])), int(round(xy[i, 1]))
        gt = depth_gt[y, x]
        if np.isfinite(gt):
            errs.append(abs(d[i] - gt) / gt)
    errs = np.asarray(errs)
    assert np.median(errs) < 0.08, np.median(errs)


def test_stereo_tracking_end_to_end():
    hw = (240, 320)
    n = 20
    world = datasets.make_world(n_points=350, n_frames=n, hw=hw, seed=4)
    settings = make_settings(world, hw)
    sys_ = System(settings)
    tracked = 0
    for i in range(n):
        left, right = datasets.render_stereo_pair(world, i, baseline=0.12)
        T = sys_.track_stereo(left, right, i / 20.0, baseline=0.12)
        tracked += T is not None
    assert sys_.state == TrackingState.OK
    assert tracked > 0.7 * n
    assert sys_.n_map_points() > 100
