"""UpdateLastFrame re-anchoring (reference: Tracking.cc:674 —
mLastFrame.SetPose(Tlr * pRef->GetPose())): when keyframe poses are
rewritten between frames (local BA, server DistributeMap, loop
correction), the motion-model prior must follow the map.  Pre-fix, the
prior stayed in the stale gauge; a distribute rebasing 40+ keyframes
kicked the next frame's pose optimization hard enough to seed a runaway
monocular scale collapse on the circuit's fast-turn section
(tools/diag_turn_window.py, VERDICT r4 weak #1)."""
import numpy as np

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


def test_prior_follows_keyframe_rewrite():
    """Rigidly transform every keyframe pose + map point between frames
    (a gauge change, as a server distribute applies); the tracker must
    keep tracking at full inlier strength because the re-anchored prior
    moves with the map."""
    hw = (240, 320)
    seq = datasets.synthesize_sequence(
        n_frames=30, hw=hw, seed=0, n_points=350, motion="arc"
    )
    sys_ = _mk_system(hw, seq.world)
    for i in range(20):
        sys_.track_monocular(seq.read(i), float(seq.timestamps[i]))
    tr = sys_.tracking
    st = sys_.store
    assert tr.state == TrackingState.OK
    inl_before = tr.matches_inliers

    # gauge change: rotate+translate the whole map (world -> world')
    ang = 0.6
    Rg = np.array([
        [np.cos(ang), 0, np.sin(ang)],
        [0, 1, 0],
        [-np.sin(ang), 0, np.cos(ang)],
    ])
    tg = np.array([0.4, -0.2, 0.3])
    G = np.eye(4, dtype=np.float64)
    G[:3, :3] = Rg
    G[:3, 3] = tg
    with st.lock:
        for k in range(st.n_kf):
            if st.kf_alive[k]:
                # Tcw' = Tcw @ G^-1  (world' = G @ world)
                st.kf_pose_cw[k] = (
                    st.kf_pose_cw[k].astype(np.float64) @ np.linalg.inv(G)
                ).astype(np.float32)
        alive = np.where(st.mp_alive[: st.n_mp])[0]
        st.mp_pos[alive] = (st.mp_pos[alive] @ Rg.T + tg).astype(
            st.mp_pos.dtype)

    # WITHOUT re-anchoring, the motion prior is ~0.5 units off in a
    # scene whose span is ~2 units -> matching windows miss and inliers
    # crater.  With it, tracking continues unperturbed.
    for i in range(20, 26):
        T = sys_.track_monocular(seq.read(i), float(seq.timestamps[i]))
        assert T is not None, f"lost tracking at frame {i} after rewrite"
    assert tr.state == TrackingState.OK
    assert tr.matches_inliers > 0.5 * max(inl_before, 30)


def test_reanchor_noop_when_ref_dead():
    """A culled reference keyframe must not poison the prior — the
    tracker falls back to the stored last-frame pose."""
    hw = (240, 320)
    seq = datasets.synthesize_sequence(
        n_frames=26, hw=hw, seed=1, n_points=350, motion="arc"
    )
    sys_ = _mk_system(hw, seq.world)
    for i in range(20):
        sys_.track_monocular(seq.read(i), float(seq.timestamps[i]))
    tr = sys_.tracking
    st = sys_.store
    assert tr.state == TrackingState.OK
    with st.lock:
        if tr._last_ref >= 0:
            st.kf_alive[tr._last_ref] = False
    for i in range(20, 24):
        sys_.track_monocular(seq.read(i), float(seq.timestamps[i]))
    assert tr.state == TrackingState.OK
