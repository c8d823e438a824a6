"""RECENTLY_LOST grace-window re-acquisition: when every per-frame
stage fails and last_frame.mp has collapsed, the tracker must
window-match the reference-keyframe neighborhood around the predicted
pose and re-enter OK — not dead-reckon until BoW relocalization
(reference: the RECENTLY_LOST hold-and-retry in Tracking.cc's state
machine)."""
import numpy as np

from swarmmap_tpu.core.map_store import NO_MP
from swarmmap_tpu.core.system import System
from swarmmap_tpu.core.tracking import TrackingState
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings


def _mk_system(hw, world):
    s = Settings(
        camera=CameraConfig(
            fx=float(world.K[0, 0]), fy=float(world.K[1, 1]),
            cx=float(world.K[0, 2]), cy=float(world.K[1, 2]),
            fps=20.0, width=hw[1], height=hw[0],
        ),
        orb=OrbConfig(n_features=400, n_levels=4),
    )
    return System(s)


def test_grace_reacquire_recovers_from_collapsed_match_set():
    hw = (240, 320)
    seq = datasets.synthesize_sequence(
        n_frames=40, hw=hw, seed=0, n_points=350, motion="arc"
    )
    sys_ = _mk_system(hw, seq.world)
    for i in range(30):
        sys_.track_monocular(seq.read(i), float(seq.timestamps[i]))
    tr = sys_.tracking
    assert tr.state == TrackingState.OK
    # simulate the collapse the motion model sees after a failed frame:
    # last_frame keeps its (dead-reckonable) pose but loses every
    # map-point association, and the BoW reference drifts (force the
    # ref-KF stage to fail by pointing it at a keyframe with no words)
    tr.last_frame.mp[:] = NO_MP
    kf_before = int(sys_.store.kf_alive[: sys_.store.n_kf].sum())
    T = sys_.track_monocular(seq.read(30), float(seq.timestamps[30]))
    # the frame must come back tracked (pose produced, state OK) via
    # the grace path, not dead-reckoned-while-lost
    assert T is not None
    assert tr.state == TrackingState.OK
    assert tr.matches_inliers >= tr.p.min_inliers_local
    assert tr.grace == 0
    # and the subsequent frames keep tracking normally
    for i in range(31, 36):
        T = sys_.track_monocular(seq.read(i), float(seq.timestamps[i]))
        assert T is not None
    assert tr.state == TrackingState.OK
    assert int(sys_.store.kf_alive[: sys_.store.n_kf].sum()) >= kf_before


def test_grace_reacquire_rejects_bad_geometry():
    """A garbage predicted pose must NOT re-acquire (the inlier gates
    keep the grace path honest)."""
    hw = (240, 320)
    seq = datasets.synthesize_sequence(
        n_frames=40, hw=hw, seed=0, n_points=350, motion="arc"
    )
    sys_ = _mk_system(hw, seq.world)
    for i in range(30):
        sys_.track_monocular(seq.read(i), float(seq.timestamps[i]))
    tr = sys_.tracking
    frame = tr.last_frame
    bad = np.eye(4, dtype=np.float32)
    bad[:3, 3] = [50.0, 50.0, -200.0]  # nowhere near the map
    f2 = type(frame).__new__(type(frame))
    f2.__dict__.update(frame.__dict__)
    f2.mp = frame.mp.copy()
    f2.pose_cw = bad
    assert tr._grace_reacquire(f2) is False
