"""Unit tests for the server layer: MBP scoring, map enhancer, map-group
merge algebra."""
import numpy as np
import pytest

from swarmmap_tpu.core.map_store import MapStore
from swarmmap_tpu.ops.lie import sim3_apply
from swarmmap_tpu.server.landmark_scoring import LandmarkScoring
from swarmmap_tpu.server.map_enhancer import MapEnhancer
from swarmmap_tpu.server.map_manager import MapManager


def small_map(rng, map_id=0, n_kf=4, n_mp=40, n_kp=64):
    st = MapStore(map_id=map_id, n_kp=n_kp, kf_capacity=8, mp_capacity=128)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    for i in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.3 * i, 0, 0]
        st.add_keyframe(
            pose_cw=T, K=K,
            kp_uv=rng.uniform(5, 60, (n_kp, 2)).astype(np.float32),
            kp_octave=rng.randint(0, 3, n_kp),
            kp_angle=rng.uniform(0, 360, n_kp).astype(np.float32),
            kp_response=rng.rand(n_kp).astype(np.float32),
            kp_valid=np.ones(n_kp, bool),
            desc=rng.randint(0, 2**32, (n_kp, 8), dtype=np.uint32),
            ts=float(i), hw=(64, 64),
        )
    for j in range(n_mp):
        pos = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(2, 5)],
                       np.float32)
        m = st.add_map_point(pos, st.kf_desc[0, j % n_kp], ref_kf=0)
        for k in range(n_kf):
            if rng.rand() < 0.7:
                st.add_observation(m, k, (j + k) % n_kp)
    return st


def test_scoring_features_and_rank(rng):
    st = small_map(rng)
    sc = LandmarkScoring(st)
    scores = sc.rank()
    assert len(scores) == st.mp_alive.sum()
    assert np.isfinite(scores).all()
    assert len(sc.kf_scores) == st.kf_alive.sum()
    # request priority: generation rate normalized by the RUNNING max —
    # once a big push sets the max, small pushes rank lower
    p_first = sc.request_priority(100)
    p_small = sc.request_priority(1)
    assert p_first > p_small


def test_scoring_csv(tmp_path, rng):
    st = small_map(rng)
    sc = LandmarkScoring(st)
    sc.rank()
    sc.save_csv(tmp_path / "scores.csv")
    lines = (tmp_path / "scores.csv").read_text().strip().splitlines()
    assert len(lines) == int(st.mp_alive.sum()) + 1
    assert lines[0].startswith("slot,gid")


def test_virtual_keyframe_identical_mode(rng):
    """reference self-test: regenerate a KF at its own pose
    (MapEnhancer.cc:19-20) — the synthesized KF must observe most of the
    same points at reprojected positions."""
    st = small_map(rng, n_kf=4, n_mp=60)
    sc = LandmarkScoring(st)
    enh = MapEnhancer(st, sc)
    vk = enh.generate_keyframe(st.kf_pose_cw[1], ref_kf=1, identical=True)
    assert vk is not None
    assert not st.kf_genuine[vk]
    n_obs = int((st.kf_kp_mp[vk] >= 0).sum())
    assert n_obs >= 20
    # observations registered both ways
    for kp, m in enumerate(st.kf_kp_mp[vk]):
        if m >= 0:
            assert st.obs[int(m)][vk] == kp


def test_compression_respects_default_disable(rng):
    st = small_map(rng, n_kf=8, n_mp=80)
    sc = LandmarkScoring(st)
    enh = MapEnhancer(st, sc)  # compression_enabled=False (reference parity)
    assert enh.compress() == 0
    enh2 = MapEnhancer(st, sc, compression_enabled=True)
    removed = enh2.compress(fraction=0.2)
    assert removed > 0


def test_merge_group_algebra(rng):
    """After MergeMap, a shared physical point maps to the same global
    coordinates through both maps' Twl transforms."""
    st1 = small_map(rng, map_id=0)
    st2 = small_map(rng, map_id=1)
    mm = MapManager()
    mm.register(st1)
    mm.register(st2)
    # ground truth: map2 local coords = S21(map1 local coords)
    from swarmmap_tpu.ops import lie
    import jax.numpy as jnp

    xi = np.array([0.1, -0.05, 0.2, 0.4, -0.3, 0.1, 0.15], np.float32)
    R12, t12, s12 = (np.asarray(x) for x in lie.sim3_exp(jnp.asarray(xi)))
    ok = mm.merge(0, 1, float(s12), R12, t12)
    assert ok
    assert st1.group_id == st2.group_id
    # a point at p2 (map2 local) with p1 = S12 p2 (map1 local) must land
    # at the same global position through either transform
    p2 = np.array([0.5, -0.2, 3.0], np.float32)
    p1 = s12 * R12 @ p2 + t12
    g1 = st1.Twl_s * st1.Twl_R @ p1 + st1.Twl_t
    g2 = st2.Twl_s * st2.Twl_R @ p2 + st2.Twl_t
    np.testing.assert_allclose(g1, g2, atol=1e-5)


def test_merge_scale_guard(rng):
    """A second merge implying a wild scale jump is rejected
    (reference: Map::SetTransform guard, Map.cc:450-486)."""
    st1 = small_map(rng, map_id=0)
    st2 = small_map(rng, map_id=1)
    st3 = small_map(rng, map_id=2)
    mm = MapManager()
    for s in (st1, st2, st3):
        mm.register(s)
    assert mm.merge(0, 1, 1.1, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    # map2 now has Twl_s=1.1; re-merging map2's group with an absurd scale
    # hits the guard on the transform update
    ok = st2.set_transform(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 50.0)
    assert not ok


def test_background_gba_abort_nonblocking(rng, monkeypatch):
    """Reference: RunGlobalBundleAdjustment runs on a detached thread and
    mbStopGBA aborts it when new work arrives (LoopClosing.cc:602-680).
    A push arriving mid-GBA must (a) not block process_request on the
    optimization and (b) abort the in-flight GBA, whose results are then
    discarded."""
    import time

    from swarmmap_tpu.ops.vocab import default_vocabulary
    from swarmmap_tpu.server import loop_closing as lc_mod
    from swarmmap_tpu.server.mediator import AgentMediator
    from swarmmap_tpu.server.scheduler import MediatorScheduler
    from swarmmap_tpu.swarm import SwarmAgent
    from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings

    vocab = default_vocabulary()
    AgentMediator.registry.clear()
    mm = MapManager()
    sched = MediatorScheduler(mm, gba_iters=40, background_gba=True)

    settings = Settings(
        camera=CameraConfig(fx=100, fy=100, cx=32, cy=32, fps=20,
                            width=64, height=64),
        orb=OrbConfig(n_features=64, n_levels=3),
    )
    agent = SwarmAgent(0, settings, vocab)
    med = AgentMediator(0, vocab, mm, n_kp=agent.system.store.n_kp)
    sched.register_mediator(med)
    st = agent.system.store
    K = settings.camera.K
    for i in range(4):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.3 * i, 0, 0]
        st.add_keyframe(
            pose_cw=T, K=K,
            kp_uv=rng.uniform(5, 60, (st.n_kp, 2)).astype(np.float32),
            kp_octave=rng.randint(0, 3, st.n_kp),
            kp_angle=rng.uniform(0, 360, st.n_kp).astype(np.float32),
            kp_response=rng.rand(st.n_kp).astype(np.float32),
            kp_valid=np.ones(st.n_kp, bool),
            desc=rng.randint(0, 2**32, (st.n_kp, 8), dtype=np.uint32),
            ts=float(i), hw=(64, 64),
        )
    for j in range(60):
        pos = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                        rng.uniform(2, 5)], np.float32)
        m = st.add_map_point(pos, st.kf_desc[0, j % st.n_kp], ref_kf=0)
        for k in range(4):
            st.add_observation(m, k, (j * 4 + k) % st.n_kp)

    real_ba = lc_mod.ba_ops.bundle_adjust

    def slow_ba(*a, **kw):
        time.sleep(0.25)
        return real_ba(*a, **kw)

    monkeypatch.setattr(lc_mod.ba_ops, "bundle_adjust", slow_ba)

    sched.enqueue_request(0, agent.push_payload())
    t0 = time.perf_counter()
    assert sched.process_pending() == 1
    dt_first = time.perf_counter() - t0
    gba_thread = sched._gba_threads[0]
    assert gba_thread.is_alive(), "GBA must run on a background thread"
    # 40 iters / chunk 4 = 10 chunks * >=0.25s: a synchronous GBA would
    # have taken >2.5s inside process_request
    assert dt_first < 2.0, f"process_request blocked on GBA ({dt_first:.1f}s)"

    with med.store.lock:
        poses_before = med.store.kf_pose_cw[: med.store.n_kf].copy()

    # second push (map points only -> no new GBA) arrives mid-GBA
    m = st.add_map_point(np.array([0, 0, 3.0], np.float32),
                         st.kf_desc[0, 0], ref_kf=0)
    st.add_observation(m, 0, 1)
    t0 = time.perf_counter()
    sched.enqueue_request(0, agent.push_payload())
    assert sched.process_pending() == 1
    assert time.perf_counter() - t0 < 2.0
    assert sched._gba_abort[0].is_set(), "push must abort the in-flight GBA"

    gba_thread.join(timeout=30)
    assert not gba_thread.is_alive()
    # aborted GBA discards its progress: keyframe poses untouched
    with med.store.lock:
        np.testing.assert_array_equal(
            med.store.kf_pose_cw[: len(poses_before)], poses_before)


def test_obs_assembly_scales_to_50k(rng):
    """VERDICT r2 item 7: BA problem assembly must be an array gather,
    <10 ms at 50k observations (the reference pays this setup cost in
    native C++ loops, Optimizer.cc:436-741; Python must use arrays)."""
    import time

    n_kf, n_mp, per_mp, n_kp = 100, 12500, 4, 1024
    st = MapStore(map_id=0, n_kp=n_kp, kf_capacity=128, mp_capacity=16384)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    for i in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.1 * i, 0, 0]
        st.add_keyframe(
            pose_cw=T, K=K,
            kp_uv=rng.uniform(0, 64, (n_kp, 2)).astype(np.float32),
            kp_octave=np.zeros(n_kp, np.int32),
            kp_angle=np.zeros(n_kp, np.float32),
            kp_response=np.ones(n_kp, np.float32),
            kp_valid=np.ones(n_kp, bool),
            desc=rng.randint(0, 2**32, (n_kp, 8), dtype=np.uint32),
            ts=float(i), hw=(64, 64),
        )
    stride = n_kf - per_mp
    for j in range(n_mp):
        m = st.add_map_point(np.array([0, 0, 2.0], np.float32),
                             st.kf_desc[0, j % n_kp], ref_kf=0)
        base = j % stride
        for k in range(base, base + per_mp):
            # collision-free kp slot per (kf, mp) pair so no observation
            # is stolen by a later point
            st.add_observation(m, k, (j // stride) * per_mp + (k - base),
                               log=False)
    om, okf, okp = st.obs_arrays()
    assert len(om) >= 50000

    kfs = st.alive_kf_slots()
    mps = st.alive_mp_slots()

    def assemble():
        cam_lut = np.full(st.n_kf, -1, np.int32)
        cam_lut[kfs] = np.arange(len(kfs), dtype=np.int32)
        pt_lut = np.full(st.n_mp, -1, np.int32)
        pt_lut[mps] = np.arange(len(mps), dtype=np.int32)
        om, okf, okp = st.obs_arrays()
        sel = (pt_lut[om] >= 0) & (cam_lut[okf] >= 0)
        sel_kf, sel_kp = okf[sel], okp[sel]
        return (cam_lut[sel_kf], pt_lut[om[sel]],
                st.kf_kp_uv[sel_kf, sel_kp])

    best = min(
        (lambda t0: (assemble(), time.perf_counter() - t0))(
            time.perf_counter())[1]
        for _ in range(5)
    )
    obs_cam, _, _ = assemble()
    assert len(obs_cam) >= 50000
    assert best < 0.010, f"assembly took {best*1e3:.1f} ms at 50k obs"


def test_group_join_rebase_is_exact(rng):
    """Joining two EXISTING groups must keep every member's global
    alignment exactly consistent.  Regression: member rebases used the
    blended Map::SetTransform path, leaving each member (1-blend) of the
    rebase delta away from the group frame — tens of degrees of
    inter-map rotation error at scale-campaign geometry."""
    from swarmmap_tpu.ops import lie
    import jax.numpy as jnp

    stores = [small_map(rng, map_id=i) for i in range(4)]
    mm = MapManager()
    for s in stores:
        mm.register(s)

    def rand_sim3(seed):
        r = np.random.RandomState(seed)
        xi = r.uniform(-0.5, 0.5, 7).astype(np.float32)
        xi[3:6] *= 2.0   # large rotations — the regression's trigger
        xi[6] *= 0.2     # modest scales so the group scale guard passes
        R, t, s = (np.asarray(x) for x in lie.sim3_exp(jnp.asarray(xi)))
        return float(s), R, t

    # two groups: {0,1} and {2,3}
    s01, R01, t01 = rand_sim3(1)
    assert mm.merge(0, 1, s01, R01, t01)
    s23, R23, t23 = rand_sim3(2)
    assert mm.merge(2, 3, s23, R23, t23)
    # join the groups through the 1<->2 pair
    s12, R12, t12 = rand_sim3(3)
    assert mm.merge(1, 2, s12, R12, t12)
    assert len({st.group_id for st in stores}) == 1

    # a physical point expressed in map 3's local frame must land at the
    # SAME global position through the chain 3 -> 2 -> 1 as through map
    # 3's own Twl
    p3 = np.array([0.4, -0.1, 2.5], np.float32)
    p2 = s23 * R23 @ p3 + t23          # map2-local (2<-3 merge Sim3)
    p1 = s12 * R12 @ p2 + t12          # map1-local
    g_via_1 = stores[1].Twl_s * stores[1].Twl_R @ p1 + stores[1].Twl_t
    g_via_3 = stores[3].Twl_s * stores[3].Twl_R @ p3 + stores[3].Twl_t
    np.testing.assert_allclose(g_via_1, g_via_3, rtol=1e-4, atol=1e-4)


def test_twl_is_server_owned(rng):
    """Clients must not echo the global transform back in pushes, and a
    distribute's twl must replicate EXACTLY (no blend) on the replica.
    Regression: every client push blended the server's Twl 90% toward
    the client's stale copy, corrupting group alignment within a few
    pushes of a rebase."""
    from swarmmap_tpu.sync.oplog import Mapit

    st = small_map(rng, map_id=0)
    R = np.eye(3, dtype=np.float32)
    st.set_transform(R, np.array([1.0, 2.0, 3.0], np.float32), 1.5,
                     exact=True)
    mapit = Mapit(st)
    # push path: no twl
    assert mapit.archive().twl is None
    # distribute path: twl present
    sl = mapit.archive(include_twl=True)
    assert sl.twl is not None

    # replica with a DIFFERENT pre-existing transform applies it exactly
    replica = small_map(rng, map_id=0)
    th = 0.8
    R_old = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0],
                      [0, 0, 1]], np.float32)
    replica.set_transform(R_old, np.zeros(3, np.float32), 0.9, exact=True)
    Mapit(replica).apply_slice(sl)
    np.testing.assert_allclose(replica.Twl_R, st.Twl_R, atol=1e-6)
    np.testing.assert_allclose(replica.Twl_t, st.Twl_t, atol=1e-6)
    assert abs(float(replica.Twl_s) - float(st.Twl_s)) < 1e-6


def test_set_transform_still_blends_estimates(rng):
    """Default (non-exact) SetTransform keeps the reference's blended
    repeated-estimate semantics (Map.cc interpolate, ratio 0.9)."""
    st = small_map(rng, map_id=0)
    st.set_transform(np.eye(3, dtype=np.float32),
                     np.zeros(3, np.float32), 1.0001)  # first: direct
    t_new = np.array([1.0, 0, 0], np.float32)
    st.set_transform(np.eye(3, dtype=np.float32), t_new, 1.0)
    # blended: strictly between old (0) and new (1)
    assert 0.0 < float(st.Twl_t[0]) < 1.0


def test_polish_group_transforms_recovers_gauge():
    """A deliberately perturbed member Twl is pulled back to consensus
    from live duplicate pairs (foreign copies vs owners)."""
    import numpy as np

    from swarmmap_tpu import MAP_BASE
    from swarmmap_tpu.core.map_store import MapStore
    from swarmmap_tpu.server.map_manager import MapManager

    mgr = MapManager()
    st0 = MapStore(map_id=0, n_kp=32)
    st1 = MapStore(map_id=1, n_kp=32)
    mgr.register(st0)
    mgr.register(st1)
    rng = np.random.RandomState(3)
    pts = rng.uniform(-4, 4, (60, 3)).astype(np.float32)
    desc = rng.randint(0, 2**32, (60, 8), dtype=np.uint32)
    # map 1 owns the points; map 0 holds foreign copies of them
    for i in range(60):
        st1.add_map_point(pts[i], desc[i], ref_kf=-1,
                          gid=MAP_BASE * 1 + i)
        st0.add_map_point(pts[i], desc[i], ref_kf=-1,
                          gid=MAP_BASE * 1 + i)
    # same group; map 1's Twl perturbed by a known Sim3
    st1.group_id = st0.group_id = 0
    mgr.groups = {0: {0, 1}}
    s_err, t_err = 1.04, np.array([0.3, -0.2, 0.1], np.float32)
    st1.set_transform(np.eye(3, dtype=np.float32) , t_err, s_err, exact=True)
    before = np.linalg.norm(
        st1.mp_global_pos(np.arange(60)) - st0.mp_global_pos(np.arange(60)),
        axis=1).mean()
    mgr.polish_group_transforms()
    after = np.linalg.norm(
        st1.mp_global_pos(np.arange(60)) - st0.mp_global_pos(np.arange(60)),
        axis=1).mean()
    assert before > 0.2 and after < 0.02, (before, after)


def test_scheduler_per_agent_fifo(monkeypatch):
    """STS priorities pick which agent is served next, but one agent's
    slices must apply in push order even when a later push would sort
    first by contribution (the op-log is sequential per stream)."""
    import numpy as np

    from swarmmap_tpu.ops.vocab import default_vocabulary
    from swarmmap_tpu.server.map_manager import MapManager
    from swarmmap_tpu.server.mediator import AgentMediator
    from swarmmap_tpu.server.scheduler import MediatorScheduler
    from swarmmap_tpu.sync import codec
    from swarmmap_tpu.sync.oplog import MapSlice, UpdateRecord

    vocab = default_vocabulary()
    AgentMediator.registry.clear()
    mm = MapManager()
    sched = MediatorScheduler(mm, gba_iters=0)
    med = AgentMediator(0, vocab, mm, n_kp=64)
    sched.register_mediator(med)

    # big slice pushed FIRST, tiny slice pushed SECOND: contribution
    # scoring would sort the tiny one (smaller load) differently —
    # processing must still be push order
    seen: list[int] = []
    monkeypatch.setattr(
        sched, "process_request",
        lambda agent_id, sl: seen.append(len(sl.updates)))
    big = MapSlice(map_id=0, kfs=[], mps=[], updates=[
        UpdateRecord(i, "mp", "SetVisible", 10**6 + i, (1,))
        for i in range(50)], twl=None)
    tiny = MapSlice(map_id=0, kfs=[], mps=[], updates=[
        UpdateRecord(0, "mp", "SetVisible", 10**6, (2,))], twl=None)
    sched.enqueue_request(0, codec.encode_slice(big))
    sched.enqueue_request(0, codec.encode_slice(tiny))
    assert sched.process_pending() == 2
    assert seen == [50, 1], f"same-agent slices reordered: {seen}"


def _build_two_map_group(rng, twl1_scale=1.1):
    """Two stores in one group observing the SAME physical landmarks:
    map 0 owns them, map 1 holds foreign copies; map 1's local frame is a
    known Sim3 away.  Geometry is jittered so BA has work to do."""
    from swarmmap_tpu import MAP_BASE
    from swarmmap_tpu.core.map_store import MapStore
    from swarmmap_tpu.ops import lie
    from swarmmap_tpu.server.map_manager import MapManager
    import jax.numpy as jnp

    n_pts, n_cams = 150, 8
    pts_w = np.stack([rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts),
                      rng.uniform(5, 9, n_pts)], 1).astype(np.float32)
    K = np.array([[450.0, 0, 160], [0, 450.0, 120], [0, 0, 1]], np.float32)
    Tg = np.zeros((n_cams, 4, 4), np.float32)  # GT world->cam SE3
    for c in range(n_cams):
        w = np.array([0.0, 0.04 * (c - n_cams / 2), 0.0], np.float32)
        Tg[c, :3, :3] = np.asarray(lie.so3_exp(jnp.asarray(w)))
        Tg[c, :3, 3] = [-0.3 * c + 1.0, 0.02 * c, 0.01 * c]
        Tg[c, 3, 3] = 1.0

    mgr = MapManager()
    st0 = MapStore(map_id=0, n_kp=256)
    st1 = MapStore(map_id=1, n_kp=256)
    mgr.register(st0)
    mgr.register(st1)
    st1.group_id = st0.group_id = 0
    mgr.groups = {0: {0, 1}}
    # map 1 local frame: rotated/translated/scaled world
    th = 0.3
    R1 = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]], np.float32)
    t1 = np.array([0.5, -0.2, 0.3], np.float32)
    s1 = twl1_scale
    st1.set_transform(R1, t1, s1, exact=True)

    def local_pose(st, c):
        # T_cw_local from GT world SE3 through the store's Twl
        s = float(st.Twl_s)
        R_g, t_g = Tg[c, :3, :3], Tg[c, :3, 3]
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R_g @ st.Twl_R
        T[:3, 3] = (t_g + R_g @ st.Twl_t) / s
        return T

    def local_pts(st):
        s = float(st.Twl_s)
        return ((pts_w - st.Twl_t) @ st.Twl_R) / s  # R^T applied rowwise

    for st, cams, owner in ((st0, range(4), True), (st1, range(4, 8), False)):
        pl = local_pts(st).astype(np.float32)
        slots = []
        for i in range(n_pts):
            m = st.add_map_point(
                pl[i] + rng.normal(0, 0.01, 3).astype(np.float32),
                np.asarray(rng.randint(0, 2**32, 8, dtype=np.uint32)),
                ref_kf=-1, gid=MAP_BASE * 0 + i)  # map 0 owns every point
            slots.append(m)
        for c in cams:
            pc = pts_w @ Tg[c, :3, :3].T + Tg[c, :3, 3]
            uv = (pc[:, :2] / pc[:, 2:3]) * 450.0 + K[:2, 2]
            vis = np.where((pc[:, 2] > 0.5) & (np.abs(uv[:, 0] - 160) < 170)
                           & (np.abs(uv[:, 1] - 120) < 130))[0][:256]
            kp_uv = np.zeros((256, 2), np.float32)
            kp_uv[: len(vis)] = uv[vis] + rng.normal(0, 0.4, (len(vis), 2))
            valid = np.zeros(256, bool)
            valid[: len(vis)] = True
            # pose perturbation: BA must undo it.  The first two cameras
            # of map 0 stay EXACT — group_global_ba fixes them as gauge
            # anchors, and perturbed anchors would force a warp (they
            # define the gauge, like kf0 does in production).
            if owner and c < 2:
                xi = np.zeros(6)
            else:
                xi = np.concatenate([rng.randn(3) * 0.01,
                                     rng.randn(3) * 0.03])
            T0 = np.asarray(
                lie.se3_exp(jnp.asarray(xi, jnp.float32))) @ local_pose(st, c)
            k = st.add_keyframe(
                pose_cw=T0.astype(np.float32), K=K, kp_uv=kp_uv,
                kp_octave=np.zeros(256, np.int32),
                kp_angle=np.zeros(256, np.float32),
                kp_response=np.ones(256, np.float32), kp_valid=valid,
                desc=rng.randint(0, 2**32, (256, 8), dtype=np.uint32))
            for kp, j in enumerate(vis):
                st.add_observation(slots[j], k, kp)
    return mgr, st0, st1, pts_w


def _group_misalignment(st0, st1, n_pts):
    a = st0.mp_global_pos(np.arange(n_pts))
    b = st1.mp_global_pos(np.arange(n_pts))
    return float(np.linalg.norm(a - b, axis=1).mean())


@pytest.mark.parametrize("use_mesh", [False, True])
def test_group_global_ba_joint_over_members(use_mesh):
    """Joint merged-group GBA couples member maps through cross-map
    duplicate observations and reduces both reprojection error and
    inter-map landmark disagreement; the mesh variant runs
    observation-sharded over 8 virtual devices (SURVEY.md §5)."""
    import jax

    from swarmmap_tpu.parallel.mesh import obs_mesh

    rng = np.random.RandomState(7)
    mgr, st0, st1, pts_w = _build_two_map_group(rng)
    before = _group_misalignment(st0, st1, 150)
    mesh = obs_mesh() if use_mesh else None
    if use_mesh:
        assert mesh.devices.size == 8
    ok = mgr.group_global_ba(0, iters=10, mesh=mesh)
    assert ok, "joint GBA did not apply"
    after = _group_misalignment(st0, st1, 150)
    # cross-map coupling: the two replicas' copies of the same landmark
    # coincide after the joint pass (they start ~2 cm apart)
    assert after < before * 0.1, (before, after)
    # structure accuracy up to the monocular gauge (Sim3-aligned — two
    # fixed cameras on a short arc leave a shallow scale/translation
    # direction that absolute coordinates would unfairly penalize)
    from swarmmap_tpu.utils.trajectory import umeyama_align

    est = st0.mp_global_pos(np.arange(150))
    s, R, t = umeyama_align(est, pts_w)
    resid = np.linalg.norm(est @ (s * R).T + t - pts_w, axis=1)
    # floor set by the 0.4 px observation noise at these baselines
    assert np.median(resid) < 0.03, np.median(resid)
