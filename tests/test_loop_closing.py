"""Server-side loop closure on a circuit trajectory: detect the revisit,
compute a sane Sim3, correct the map (SURVEY.md §3 loop pipeline)."""
import numpy as np
import pytest

from swarmmap_tpu.swarm import Swarm, SwarmConfig
from swarmmap_tpu.utils import datasets
from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings
from swarmmap_tpu.utils.trajectory import ate_rmse


@pytest.fixture(scope="module")
def circuit_run():
    hw = (240, 320)
    n_frames = 100
    seq = datasets.synthesize_sequence(
        n_frames=n_frames, hw=hw, seed=2, agent=0, n_points=700, motion="circuit"
    )
    w = seq.world
    settings = Settings(
        camera=CameraConfig(
            fx=float(w.K[0, 0]), fy=float(w.K[1, 1]),
            cx=float(w.K[0, 2]), cy=float(w.K[1, 2]),
            fps=20.0, width=hw[1], height=hw[0],
        ),
        orb=OrbConfig(n_features=400, n_levels=4),
    )
    swarm = Swarm(1, settings, config=SwarmConfig(push_every=10, report_every=5),
                  run_server_gba=True)
    poses = {}
    for i in range(n_frames):
        T = swarm.agents[0].track(seq.read(i), float(seq.timestamps[i]))
        if T is not None:
            poses[i] = T
        swarm.frame_count += 1
        if swarm.frame_count % 10 == 0:
            swarm.sync()
    swarm.finish()
    return swarm, seq, poses


def test_circuit_tracked(circuit_run):
    swarm, seq, poses = circuit_run
    assert len(poses) > 0.85 * len(seq)


def test_loop_detected_and_closed(circuit_run):
    swarm, _, _ = circuit_run
    assert swarm.mediators[0].loop_closing.n_loops_closed >= 1


def test_loop_scale_sane(circuit_run):
    """After the local-BA gauge anchor fix, monocular scale must not
    drift over the lap — the loop Sim3 lands near unit scale and the
    corrected server map is accurate."""
    swarm, seq, _ = circuit_run
    st = swarm.mediators[0].store
    w = seq.world
    est, gt = [], []
    for k in st.alive_kf_slots():
        fi = int(round(st.kf_ts[k] * 20))
        if fi < len(seq):
            est.append(np.linalg.inv(st.kf_pose_cw[k])[:3, 3])
            gt.append(w.poses_wc[fi][:3, 3])
    est, gt = np.stack(est), np.stack(gt)
    rmse = ate_rmse(est, gt)
    span = np.linalg.norm(gt.max(0) - gt.min(0))
    assert rmse < 0.05 * span, f"ATE {rmse:.3f} on span {span:.1f}"


def test_loop_search_and_fuse(circuit_run):
    """After CorrectLoop, SearchAndFuse must merge duplicate landmarks
    across the loop boundary (reference: LoopClosing.cc:552-576) — map
    points end up observed by BOTH early (loop-side) and late
    (current-side) keyframes."""
    swarm, _, _ = circuit_run
    lc = swarm.mediators[0].loop_closing
    assert lc.n_fused > 0, "SearchAndFuse merged nothing"
    st = swarm.mediators[0].store
    kfs = st.alive_kf_slots()
    span = int(kfs.max() - kfs.min())
    cross = 0
    for m, ob in st.obs.items():
        if not st.mp_alive[m] or len(ob) < 2:
            continue
        ks = list(ob)
        if max(ks) - min(ks) > 0.5 * span:
            cross += 1
    assert cross > 0, "no landmark observed across the loop boundary"


def test_loop_edges_recorded(circuit_run):
    swarm, _, _ = circuit_run
    st = swarm.mediators[0].store
    n_loop_edges = sum(len(v) for v in st.kf_loop_edges.values())
    assert n_loop_edges >= 2  # one loop = an edge on each endpoint


def test_map_segmentation(circuit_run):
    """Loop boundaries split the map into >=MIN_SEG_LENGTH slices
    (reference: SegmentMapByKeyFrame)."""
    swarm, _, _ = circuit_run
    segs = swarm.mediators[0].segment_map()
    assert len(segs) >= 1
    total = sum(len(s) for s in segs)
    st = swarm.mediators[0].store
    assert total == len(st.alive_kf_slots())
    for s in segs:
        assert len(s) >= 8 or s is segs[-1]


def test_global_ba_abort_discards_progress(circuit_run):
    """mbStopGBA analogue: an aborted GBA must leave the map untouched;
    an uninterrupted one is free to move poses."""
    swarm, seq, poses = circuit_run
    med = swarm.mediators[0]
    st = med.store
    kfs = st.alive_kf_slots()
    before = st.kf_pose_cw[kfs].copy()
    pts_before = st.mp_pos[: st.n_mp].copy()
    calls = []

    def abort_after_first():
        calls.append(1)
        return len(calls) >= 2  # allow chunk 1, abort before chunk 2

    med.loop_closing.global_ba(iters=8, should_abort=abort_after_first, chunk=2)
    np.testing.assert_array_equal(st.kf_pose_cw[kfs], before)
    np.testing.assert_array_equal(st.mp_pos[: st.n_mp], pts_before)
    assert len(calls) >= 2  # the poll actually ran between chunks
