"""Multi-agent collaborative mapping tests: client->server sync, STS
scheduling, and cross-agent map fusion on a shared synthetic world."""
import numpy as np
import pytest

from swarmmap_tpu.swarm import Swarm, SwarmConfig
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


@pytest.fixture(scope="module")
def swarm_run():
    hw = (240, 320)
    n_frames = 36
    seqs = [
        datasets.synthesize_sequence(n_frames=n_frames, hw=hw, seed=0,
                                     agent=a, n_points=350)
        for a in range(2)
    ]
    settings = make_settings(seqs[0].world, hw)
    swarm = Swarm(2, settings, config=SwarmConfig(push_every=8, report_every=4),
                  run_server_gba=False)
    for i in range(n_frames):
        swarm.step([s.read(i) for s in seqs], seqs[0].timestamps[i])
    swarm.finish()
    return swarm, seqs


def test_clients_track(swarm_run):
    swarm, seqs = swarm_run
    for agent in swarm.agents:
        assert agent.frames_tracked > 0.5 * len(seqs[0]), agent.frames_tracked
        assert agent.system.n_keyframes() >= 3


def test_agents_batched_into_one_dispatch(swarm_run):
    """Steady-state frames must run ALL agents as one fused device
    dispatch (SURVEY.md §2.10 row 1 — the TPU answer to the reference's
    per-agent CUDA threads, swarm_map.cc:310-341)."""
    swarm, seqs = swarm_run
    # after both agents initialize, the bulk of frames should batch
    assert swarm.fused_cohort_dispatches > 0.3 * len(seqs[0]), (
        swarm.fused_cohort_dispatches
    )


def test_server_replicas_mirror_clients(swarm_run):
    swarm, _ = swarm_run
    for agent, med in zip(swarm.agents, swarm.mediators):
        cst = agent.system.store
        # every ALIVE client KF (KFs culled before a push never ship) must
        # exist on the server, modulo the tail created after the last sync
        alive_gids = {int(g) for g in cst.kf_gid[: cst.n_kf][cst.kf_alive[: cst.n_kf]]}
        server_kfs = set(med.store.kf_by_gid)
        missing = {g for g in alive_gids if g not in server_kfs}
        assert len(missing) <= 2, f"server missing {len(missing)} keyframes"
        client_alive = agent.system.store.mp_alive.sum()
        server_alive = med.store.mp_alive.sum()
        assert server_alive > 0.5 * client_alive, (server_alive, client_alive)


def test_push_sizes_reasonable(swarm_run):
    swarm, seqs = swarm_run
    for agent in swarm.agents:
        assert agent.bytes_pushed > 0
        # change-log sync: payloads stay well under whole-map-every-push
        from swarmmap_tpu.sync import codec
        from swarmmap_tpu.sync.oplog import full_archive
        full = len(codec.encode_slice(full_archive(agent.system.store)))
        n_pushes = len(seqs[0]) // swarm.config.push_every
        assert agent.bytes_pushed < full * max(n_pushes, 1), (
            "incremental pushes should beat re-sending the whole map each time"
        )


def test_cross_agent_fusion(swarm_run):
    """The two agents observe the same landmark field -> the server should
    discover the overlap and merge their maps into one group."""
    swarm, _ = swarm_run
    groups = swarm.merged_groups()
    biggest = max(groups, key=len)
    assert len(biggest) == 2, f"maps not merged: groups={groups}"
    # after the merge the two maps share a base frame: the Twl transforms
    # map agent-1 local coords into the group frame; ground truth for both
    # agents lives in the same world coordinates
    st0 = swarm.mediators[0].store
    st1 = swarm.mediators[1].store
    assert st0.group_id == st1.group_id


def test_cross_map_point_fusion(swarm_run):
    """After the Sim3 merge, MapManager.fuse must actually deduplicate:
    the dst replica holds the src map's landmarks under their foreign
    gids, and dst-native duplicates were Replaced (reference:
    MapManager::Fuse + MapPoint::Replace, MapManager.cc:118-153)."""
    from swarmmap_tpu import MAP_BASE

    swarm, _ = swarm_run
    events = swarm.map_manager.fuse_events
    assert events, "merge never triggered a fuse pass"
    total_fused = sum(n for _, _, n in events)
    assert total_fused > 0, f"fuse matched nothing: {events}"
    dst, src, _ = max(events, key=lambda e: e[2])
    st_d = swarm.map_manager.stores[dst]
    # foreign landmarks present under their original ids
    gids = st_d.mp_gid[: st_d.n_mp][st_d.mp_alive[: st_d.n_mp]]
    n_foreign = int(np.sum(gids // MAP_BASE != dst))
    assert n_foreign > 0
    # foreign points are observed by dst keyframes (either via Replace or
    # via free-keypoint AddObservation)
    observed_foreign = 0
    for m, ob in st_d.obs.items():
        if st_d.mp_alive[m] and int(st_d.mp_gid[m]) // MAP_BASE != dst and ob:
            observed_foreign += 1
    assert observed_foreign > 0


def test_double_buffered_dispatch_matches_sync(swarm_run):
    """ROADMAP #1: double-buffered dispatch (frame t dispatched before
    frame t-1 commits, pose guess chained on device) must track the same
    sequences with the same accuracy as the synchronous cohort path —
    the staleness it introduces is one commit in the local-map bucket,
    not a tracking regression."""
    from swarmmap_tpu.utils.trajectory import ate_rmse

    sync_swarm, seqs = swarm_run
    n_frames = len(seqs[0])
    settings = make_settings(seqs[0].world, (240, 320))
    swarm = Swarm(2, settings,
                  config=SwarmConfig(push_every=8, report_every=4,
                                     double_buffer=True),
                  run_server_gba=False)
    for i in range(n_frames):
        swarm.step([s.read(i) for s in seqs], float(seqs[0].timestamps[i]))
    swarm.finish()
    assert swarm._pending is None, "finish() must flush the in-flight dispatch"
    assert swarm.fused_cohort_dispatches > 0.3 * n_frames
    for agent, ref_agent, seq in zip(swarm.agents, sync_swarm.agents, seqs):
        assert agent.frames_tracked >= min(0.9 * ref_agent.frames_tracked,
                                           0.6 * n_frames), (
            agent.frames_tracked, ref_agent.frames_tracked)
        # per-frame trajectory accuracy vs ground truth
        ts_to_idx = {float(t): i for i, t in enumerate(seq.timestamps)}
        tr = agent.system.tracking.trajectory
        idx = [ts_to_idx[float(t)] for t, _ in tr if float(t) in ts_to_idx]
        est_t = np.stack([T[:3, 3] for _, T in tr])
        gt_t = seq.world.poses_wc[idx][:, :3, 3]
        span = np.linalg.norm(gt_t.max(0) - gt_t.min(0))
        rmse = ate_rmse(est_t, gt_t)
        assert rmse < 0.05 * span, f"ATE {rmse:.3f} vs span {span:.2f}"


def test_sts_priority_ordering():
    """Unstable agents outrank stable ones regardless of contribution."""
    from swarmmap_tpu.core.tracking import SystemState
    from swarmmap_tpu.server.map_manager import MapManager
    from swarmmap_tpu.server.mediator import AgentMediator
    from swarmmap_tpu.server.scheduler import MediatorScheduler
    from swarmmap_tpu.sync.oplog import MapSlice
    from swarmmap_tpu.ops.vocab import default_vocabulary

    AgentMediator.registry.clear()
    mm = MapManager()
    sched = MediatorScheduler(mm)
    meds = [AgentMediator(i, default_vocabulary(), mm, n_kp=64) for i in range(3)]
    for m in meds:
        sched.register_mediator(m)
    loc = np.zeros(3, np.float32)
    meds[0].set_state(SystemState(loc, False, True, 100, 0))   # stable
    meds[1].set_state(SystemState(loc, False, False, 5, 3))    # LOST
    meds[2].set_state(SystemState(loc, True, True, 15, 0))     # burst + low tracked
    sl = MapSlice(map_id=0, kfs=[], mps=[], updates=[])
    p0 = sched._priority(meds[0], sl)
    p1 = sched._priority(meds[1], sl)
    p2 = sched._priority(meds[2], sl)
    assert p1 < p2 < p0  # lost < lost-prevention < enrichment


def test_async_mapping_mode():
    """Tracking||mapping overlap (reference: free LocalMapping thread):
    the async mode must track the same sequence successfully with map
    mutations serialized through store.lock."""
    hw = (240, 320)
    n_frames = 30
    seq = datasets.synthesize_sequence(n_frames=n_frames, hw=hw, seed=5,
                                       agent=0, n_points=350)
    settings = make_settings(seq.world, hw)
    swarm = Swarm(1, settings,
                  config=SwarmConfig(push_every=8, report_every=4,
                                     async_mapping=True),
                  run_server_gba=False)
    tracked = 0
    for i in range(n_frames):
        swarm.step([seq.read(i)], float(seq.timestamps[i]))
    # drain the worker before asserting
    swarm.agents[0].system.local_mapping.wait_idle()
    swarm.finish()
    a = swarm.agents[0]
    assert a.frames_tracked > 0.8 * n_frames, a.frames_tracked
    st = a.system.store
    assert st.kf_alive[: st.n_kf].sum() >= 2
    assert st.mp_alive[: st.n_mp].sum() > 100
    # server replica got the pushes
    med = swarm.mediators[0]
    assert len(med.store.kf_by_gid) >= 2


def test_fully_async_combined_mode():
    """async_mapping + async_server together (the production bench
    configuration): tracking, the per-agent mapping workers, and the STS
    scheduler worker all overlap; the run must still track and replicate
    (reference: free-running LocalMapping + MediatorScheduler::Run)."""
    hw = (240, 320)
    n_frames = 30
    seqs = [
        datasets.synthesize_sequence(n_frames=n_frames, hw=hw, seed=5,
                                     agent=a, n_points=350)
        for a in range(2)
    ]
    settings = make_settings(seqs[0].world, hw)
    swarm = Swarm(2, settings,
                  config=SwarmConfig(push_every=8, report_every=4,
                                     async_mapping=True, async_server=True),
                  run_server_gba=False)
    for i in range(n_frames):
        swarm.step([s.read(i) for s in seqs], float(seqs[0].timestamps[i]))
    for a in swarm.agents:
        a.system.local_mapping.wait_idle()
    swarm.finish()
    for a in swarm.agents:
        assert a.frames_tracked > 0.8 * n_frames, a.frames_tracked
    for med in swarm.mediators:
        assert len(med.store.kf_by_gid) >= 2


def test_mesh_sharded_swarm_with_merge():
    """8 agents sharded one-per-device over the virtual 8-CPU mesh (the
    production multi-chip path, SURVEY.md §2.10 row 1): the cohort runs
    through the shard_map'd program, the ICI descriptor-overlap hint
    reaches the mediators, and cross-agent merging still happens."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (conftest)")
    hw = (240, 320)
    n_frames = 24
    n_agents = 8
    seqs = [
        datasets.synthesize_sequence(n_frames=n_frames, hw=hw, seed=0,
                                     agent=a % 3, n_points=350)
        for a in range(n_agents)
    ]
    settings = make_settings(seqs[0].world, hw)
    swarm = Swarm(n_agents, settings,
                  config=SwarmConfig(push_every=8, report_every=4),
                  run_server_gba=False)
    assert swarm.mesh is not None, "8 agents on 8 devices must build a mesh"
    assert swarm.mesh.devices.size == 8
    for i in range(n_frames):
        swarm.step([s.read(i) for s in seqs], seqs[0].timestamps[i])
    swarm.finish()
    tracked = [a.frames_tracked for a in swarm.agents]
    assert sum(t > 0.5 * n_frames for t in tracked) >= 6, tracked
    assert swarm.fused_cohort_dispatches > 0, "mesh cohort never dispatched"
    # the ICI overlap prefilter reached the server side
    assert swarm.overlap_hint is not None
    assert swarm.overlap_hint.shape == (n_agents, n_agents)
    assert any(m.overlap_hint for m in swarm.mediators)
    # same-world agents must merge into a multi-map group
    biggest = max(swarm.merged_groups(), key=len)
    assert len(biggest) >= 2, f"no merge: {swarm.merged_groups()}"


def test_distribute_rebase_gate():
    """A distribute that refines the reference KF pose by millimeters must
    NOT touch the tracker's motion state (velocity / last-frame pose); a
    large rebase (loop correction / merge-scale jump) must re-anchor the
    last frame through the reference KF and invalidate the motion model.
    Regression test for the 504e490 tracking-loss regression."""
    from swarmmap_tpu.core.frame import Frame
    from swarmmap_tpu.ops.vocab import default_vocabulary
    from swarmmap_tpu.swarm import SwarmAgent
    from swarmmap_tpu.sync import codec
    from swarmmap_tpu.sync.oplog import MapSlice, UpdateRecord

    hw = (240, 320)
    settings = Settings(
        camera=CameraConfig(fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                            fps=20.0, width=hw[1], height=hw[0]),
        orb=OrbConfig(n_features=64, n_levels=2),
    )
    agent = SwarmAgent(0, settings, vocab=default_vocabulary())
    st = agent.system.store
    tr = agent.system.tracking
    n = st.n_kp
    rng = np.random.RandomState(3)
    k = st.add_keyframe(
        pose_cw=np.eye(4, dtype=np.float32),
        K=np.array([[300, 0, 160], [0, 300, 120], [0, 0, 1]], np.float32),
        kp_uv=rng.rand(n, 2).astype(np.float32) * 200,
        kp_octave=np.zeros(n, np.int32),
        kp_angle=np.zeros(n, np.float32),
        kp_response=rng.rand(n).astype(np.float32),
        kp_valid=np.ones(n, bool),
        desc=rng.randint(0, 2**32, (n, 8), dtype=np.uint32),
        ts=0.0, frame_id=0, hw=hw,
    )
    gid = int(st.kf_gid[k])
    tr.ref_kf = k
    lf = Frame.__new__(Frame)
    lf.pose_cw = np.eye(4, dtype=np.float32)
    tr.last_frame = lf
    vel = np.eye(4, dtype=np.float32)
    vel[0, 3] = 0.01
    tr.velocity = vel.copy()

    def distribute(pose):
        sl = MapSlice(map_id=0, kfs=[], mps=[], updates=[
            UpdateRecord(seq=0, kind="kf", func="SetPose", target=gid,
                         args=(pose.astype(np.float32),))])
        agent.receive_distribute(codec.encode_slice(sl))

    # millimetric GBA refinement: tracker state untouched
    small = np.eye(4, dtype=np.float32)
    small[1, 3] = 0.002
    distribute(small)
    assert tr.velocity is not None
    np.testing.assert_allclose(tr.last_frame.pose_cw, np.eye(4), atol=1e-7)

    # large rebase: last frame re-anchored, motion model invalidated
    big = np.eye(4, dtype=np.float32)
    big[0, 3] = 1.5
    distribute(big)
    assert tr.velocity is None
    # last_frame carried by the same rigid change the ref KF underwent
    np.testing.assert_allclose(tr.last_frame.pose_cw[0, 3], 1.5, atol=1e-3)
