import numpy as np
import pytest

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


def test_lk_flow_recovers_translation():
    """Pyramidal LK on a textured frame shifted by a known offset."""
    from swarmmap_tpu.core.dynamic import lk_flow
    from swarmmap_tpu.utils import datasets

    w = datasets.make_world(n_points=150, n_frames=2, hw=(120, 160), seed=4)
    img = datasets.render_frame(w, 0).astype(np.float32)
    dx, dy = 3, 2
    nxt = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    pts = np.stack(np.meshgrid(np.arange(30, 130, 12),
                               np.arange(30, 90, 12)), -1).reshape(-1, 2)
    flow, ok = lk_flow(img, nxt, pts.astype(np.float32))
    assert ok.sum() >= 10
    med = np.median(flow[ok], axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.5)


def test_mask_propagation_follows_object():
    """A mask over a moving textured block must follow it to the next
    frame (reference: optical-flow mask propagation,
    DynamicExtractor.h:40-53)."""
    from swarmmap_tpu.core.dynamic import propagate_mask

    rng = np.random.RandomState(0)
    h, w = 120, 160
    base = rng.randint(20, 60, (h, w)).astype(np.float32)
    block = rng.randint(120, 255, (40, 40)).astype(np.float32)

    def frame(ox):
        f = base.copy()
        f[40:80, ox:ox + 40] = block
        return f.astype(np.uint8)

    prev, nxt = frame(30), frame(36)
    mask = np.zeros((h, w), bool)
    mask[40:80, 30:70] = True
    out = propagate_mask(prev, nxt, mask)
    truth = np.zeros((h, w), bool)
    truth[40:80, 36:76] = True
    iou = (out & truth).sum() / max((out | truth).sum(), 1)
    assert iou > 0.55, f"IoU {iou:.2f}"


def test_dynamic_extractor_cadence():
    """Segment every N frames, flow-propagate in between."""
    from swarmmap_tpu.core.dynamic import DynamicExtractor

    calls = []
    rng = np.random.RandomState(1)
    base = rng.randint(0, 255, (64, 64)).astype(np.uint8)

    def seg(img):
        calls.append(1)
        m = np.zeros(img.shape, bool)
        m[20:40, 20:40] = True
        return m

    ex = DynamicExtractor(seg, segment_every=3)
    for _ in range(6):
        m = ex.mask_for(base)
        assert m.dtype == bool and m.shape == base.shape
    assert len(calls) == 2  # frames 0 and 3


def test_dynamic_filter_improves_tracking_on_moving_object(rng):
    """A textured block sweeping across the static world: residual
    voting must flag its landmarks dynamic, and filtered tracking must
    be at least as accurate as unfiltered (reference: the point of
    Dynamic_ORB_SLAM2's voting)."""
    from swarmmap_tpu.swarm import Swarm, SwarmConfig
    from swarmmap_tpu.core.tracking import TrackingParams
    from swarmmap_tpu.utils import datasets
    from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings
    from swarmmap_tpu.utils.trajectory import ate_rmse

    hw = (240, 320)
    n_frames = 24
    seq = datasets.synthesize_sequence(n_frames=n_frames, hw=hw, seed=6,
                                       agent=0, n_points=320)
    w = seq.world
    block = rng.randint(100, 255, (48, 48)).astype(np.uint8)

    frames = []
    for i in range(n_frames):
        f = seq.read(i).copy()
        # object crosses the image against the camera's apparent motion
        ox = 20 + 9 * i
        oy = 90
        if ox + 48 < hw[1]:
            f[oy:oy + 48, ox:ox + 48] = np.maximum(f[oy:oy+48, ox:ox+48], block)
        frames.append(f)

    settings = Settings(
        camera=CameraConfig(fx=float(w.K[0, 0]), fy=float(w.K[1, 1]),
                            cx=float(w.K[0, 2]), cy=float(w.K[1, 2]),
                            fps=20.0, width=hw[1], height=hw[0]),
        orb=OrbConfig(n_features=400, n_levels=4),
    )

    def run(dyn: bool):
        swarm = Swarm(1, settings, config=SwarmConfig(push_every=50),
                      tracking_params=TrackingParams(dynamic_filter=dyn),
                      run_server_gba=False)
        for i in range(n_frames):
            swarm.step([frames[i]], float(seq.timestamps[i]))
        swarm.finish()
        tr = swarm.agents[0].system.tracking
        est, gt = [], []
        for ts, Twc in tr.trajectory:
            fi = int(round(ts * 20))
            if fi < n_frames:
                est.append(Twc[:3, 3])
                gt.append(w.poses_wc[fi][:3, 3])
        return swarm, ate_rmse(np.stack(est), np.stack(gt)), len(est)

    swarm_f, ate_f, n_f = run(True)
    _, ate_u, n_u = run(False)
    # the voting ledger saw dynamic evidence
    tr = swarm_f.agents[0].system.tracking
    assert tr.dynamic.votes.dyn.sum() > 0, "no dynamic votes accumulated"
    assert n_f >= 0.8 * n_frames
    # filtered tracking is at least as accurate (tolerate tiny noise)
    assert ate_f <= ate_u * 1.1 + 1e-3, (ate_f, ate_u)


def test_torch_segmenter_model_through_hook():
    """The segment_fn hook runs a REAL deep-learning-framework model
    (reference: DynamicExtractor.cc wires Mask-RCNN through cv::dnn;
    no pretrained weights ship in either repo).  A torch conv net with a
    deterministic brightness kernel segments a moving bright square; the
    DynamicExtractor cadence + flow propagation consume its masks."""
    torch = pytest.importorskip("torch")
    from swarmmap_tpu.core.dynamic import DynamicExtractor

    net = torch.nn.Conv2d(1, 1, 5, padding=2, bias=False)
    with torch.no_grad():
        net.weight[:] = 1.0 / 25.0  # 5x5 box filter: local brightness

    def segment(img):
        with torch.no_grad():
            x = torch.from_numpy(np.asarray(img, np.float32))[None, None]
            heat = net(x)[0, 0].numpy()
        return heat > 128.0

    ex = DynamicExtractor(segment, segment_every=2)
    h, w = 120, 160
    for t in range(4):
        img = np.full((h, w), 40, np.float32)
        x0 = 40 + 8 * t
        img[30:60, x0:x0 + 30] = 250.0
        mask = ex.mask_for(img)
        assert mask[45, x0 + 15], f"frame {t}: object center not masked"
        assert not mask[100, 20], f"frame {t}: background masked"
