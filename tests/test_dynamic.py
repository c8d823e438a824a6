import numpy as np

from swarmmap_tpu.core.dynamic import DynamicRunner, DynamicVotes
from swarmmap_tpu.core.map_store import MapStore


def make_store_with_kf(rng, n_kp=64):
    st = MapStore(map_id=0, n_kp=n_kp, kf_capacity=4, mp_capacity=128)
    k = st.add_keyframe(
        pose_cw=np.eye(4, dtype=np.float32),
        K=np.array([[100, 0, 32], [0, 100, 32], [0, 0, 1]], np.float32),
        kp_uv=rng.uniform(0, 64, (n_kp, 2)).astype(np.float32),
        kp_octave=np.zeros(n_kp, np.int32),
        kp_angle=np.zeros(n_kp, np.float32),
        kp_response=np.ones(n_kp, np.float32),
        kp_valid=np.ones(n_kp, bool),
        desc=rng.randint(0, 2**32, (n_kp, 8), dtype=np.uint32),
        hw=(64, 64),
    )
    for i in range(32):
        m = st.add_map_point(np.array([0, 0, 2.0]), st.kf_desc[k, i], ref_kf=k)
        st.add_observation(m, k, i)
    return st, k


def test_mask_voting_flags_dynamic_points(rng):
    st, k = make_store_with_kf(rng)
    # dynamic object occupies the left half of the image
    mask = np.zeros((64, 64), bool)
    mask[:, :32] = True
    runner = DynamicRunner(st, segment_fn=lambda img: mask)
    img = np.zeros((64, 64), np.uint8)
    for _ in range(DynamicRunner.__init__.__defaults__ and 4 or 4):
        runner.enqueue(k, img, score=1.0)
    runner.process(max_items=4)
    slots = np.arange(st.n_mp)
    dyn = runner.votes.is_dynamic(slots)
    uv = st.kf_kp_uv[k][: st.n_mp]
    left = uv[:, 0] < 32
    # points on the object flagged, others not
    assert dyn[left].mean() > 0.9
    assert dyn[~left].sum() == 0


def test_residual_voting():
    st = MapStore(map_id=0, n_kp=8, kf_capacity=2, mp_capacity=16)
    runner = DynamicRunner(st)
    slots = np.arange(8)
    for _ in range(4):
        chi2 = np.array([100.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1])
        runner.vote_from_residuals(slots, chi2)
    keep = runner.filter_static(slots)
    assert not keep[0]
    assert keep[1:].all()


def test_dynamic_filter_wired_into_tracking():
    """dynamic_filter=True: pose-opt outliers accumulate dynamic votes
    and voted points disappear from the tracking candidate sets."""
    import numpy as np

    from swarmmap_tpu.swarm import Swarm, SwarmConfig
    from swarmmap_tpu.core.tracking import TrackingParams
    from swarmmap_tpu.utils import datasets
    from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings

    hw = (240, 320)
    seq = datasets.synthesize_sequence(n_frames=16, hw=hw, seed=3,
                                       agent=0, n_points=350)
    w = seq.world
    settings = Settings(
        camera=CameraConfig(fx=float(w.K[0, 0]), fy=float(w.K[1, 1]),
                            cx=float(w.K[0, 2]), cy=float(w.K[1, 2]),
                            fps=20.0, width=hw[1], height=hw[0]),
        orb=OrbConfig(n_features=400, n_levels=4),
    )
    swarm = Swarm(1, settings, config=SwarmConfig(push_every=8),
                  tracking_params=TrackingParams(dynamic_filter=True),
                  run_server_gba=False)
    for i in range(16):
        swarm.step([seq.read(i)], float(seq.timestamps[i]))
    swarm.finish()
    tr = swarm.agents[0].system.tracking
    assert tr.dynamic is not None
    # votes accumulated (static-world sequence: static votes dominate)
    assert tr.dynamic.votes.stat.sum() > 0
    assert swarm.agents[0].frames_tracked > 12
    # a hand-voted dynamic point is excluded by filter_static
    st = swarm.agents[0].system.store
    m = int(np.where(st.mp_alive[: st.n_mp])[0][0])
    for _ in range(5):
        tr.dynamic.votes.vote(np.array([m]), np.array([True]))
    keep = tr.dynamic.filter_static(np.array([m]))
    assert not keep[0]
