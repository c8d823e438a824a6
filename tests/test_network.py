"""Websocket transport tests: dispatch handshake, push/distribute round
trip over real loopback sockets (the standalone client/server path —
reference: client.cc / server.cc)."""
import time

import numpy as np
import pytest

from swarmmap_tpu.net.client_service import ClientService
from swarmmap_tpu.net.server_service import DispatchService, ServerService
from swarmmap_tpu.net.wsrpc import WsClient, WsServer, ws_round_trip
from swarmmap_tpu.sync.codec import Request


def free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_ws_round_trip_and_broadcast():
    port = free_port()
    got = []

    def on_request(req, reply):
        got.append(req.path)
        reply(Request(src=0, dst=req.src, path="Ack", body=req.body))

    server = WsServer("127.0.0.1", port, on_request)
    server.start()
    reply = ws_round_trip("127.0.0.1", port, Request(1, 0, "Hello", b"xyz"))
    assert reply.path == "Ack" and reply.body == b"xyz"
    assert got == ["Hello"]

    received = []
    client = WsClient("127.0.0.1", port, on_request=lambda r: received.append(r.path))
    client.connect()
    # the broadcast races the server registering the new connection;
    # retry until the subscription is live (CI machines under load)
    for _ in range(100):
        server.broadcast(Request(0, -1, "News", b""))
        time.sleep(0.1)
        if received:
            break
    assert received and received[0] == "News"
    client.close()
    server.stop()


@pytest.fixture(params=["msgpack", "boost-text"])
def wire_mode(request):
    """Run the full network flow in both outbound wire formats
    (boost-text = the reference's archive grammar, BoostArchiver.h)."""
    from swarmmap_tpu.sync import codec as codec_mod

    codec_mod.set_wire_mode(request.param)
    yield request.param
    codec_mod.set_wire_mode("msgpack")


def test_dispatch_and_push_flow(wire_mode):
    """Full standalone flow on loopback: register -> connect -> push ->
    server applies -> distribute -> client applies — in BOTH wire modes
    (reference interop: ClientService.cc:113-172, MapUpdater.cc:192-230)."""
    from swarmmap_tpu.ops.vocab import default_vocabulary
    from swarmmap_tpu.server.map_manager import MapManager
    from swarmmap_tpu.server.mediator import AgentMediator
    from swarmmap_tpu.server.scheduler import MediatorScheduler
    from swarmmap_tpu.swarm import SwarmAgent
    from swarmmap_tpu.utils.config import CameraConfig, OrbConfig, Settings

    vocab = default_vocabulary()
    AgentMediator.registry.clear()
    mm = MapManager()
    services = {}

    sched = MediatorScheduler(
        mm, distribute_fn=lambda aid, data: services[aid].distribute_map(data)
    )

    def make_mediator(agent_id):
        med = AgentMediator(agent_id, vocab, mm, n_kp=128)
        sched.register_mediator(med)
        svc = ServerService(agent_id, sched, host="127.0.0.1",
                            port=free_port())
        svc.start()
        services[agent_id] = svc
        return svc

    dport = free_port()
    dispatch = DispatchService("127.0.0.1", dport, make_mediator, next_id=5)
    dispatch.start()

    settings = Settings(
        camera=CameraConfig(fx=230, fy=230, cx=160, cy=120, fps=20,
                            width=320, height=240),
        orb=OrbConfig(n_features=128, n_levels=3),
    )
    agent = SwarmAgent(0, settings, vocab)
    svc = ClientService(agent, "127.0.0.1")
    new_id, data_port = svc.register(dport)
    assert new_id == 5
    assert agent.system.store.map_id == 5
    svc.connect(data_port)

    # fabricate a tiny map client-side and push it
    st = agent.system.store
    rng = np.random.RandomState(0)
    k = st.add_keyframe(
        pose_cw=np.eye(4, dtype=np.float32),
        K=settings.camera.K,
        kp_uv=rng.rand(st.n_kp, 2).astype(np.float32) * 100,
        kp_octave=np.zeros(st.n_kp, np.int32),
        kp_angle=np.zeros(st.n_kp, np.float32),
        kp_response=np.ones(st.n_kp, np.float32),
        kp_valid=np.ones(st.n_kp, bool),
        desc=rng.randint(0, 2**32, (st.n_kp, 8), dtype=np.uint32),
    )
    m = st.add_map_point(np.array([0, 0, 2.0]), st.kf_desc[k, 0], ref_kf=k)
    st.add_observation(m, k, 0)
    assert svc.push_map() > 0

    med = AgentMediator.registry[5]
    for _ in range(100):
        if sched.process_pending():
            break
        time.sleep(0.05)
    assert med.store.n_kf == 1 and med.store.n_mp == 1

    # server-side mutation -> distribute -> client applies
    new_pose = np.eye(4, dtype=np.float32)
    new_pose[2, 3] = 9.0
    med.store.set_kf_pose(0, new_pose)
    sched.map_distribute(5)
    for _ in range(100):
        if agent.system.store.kf_pose_cw[0][2, 3] == 9.0:
            break
        time.sleep(0.05)
    assert agent.system.store.kf_pose_cw[0][2, 3] == 9.0

    # pull: the server holds a keyframe + point the client lacks (as a
    # server-side virtual/rescue keyframe would be); the client asks via
    # PullMap, the server answers ReplyPull with the latest-5-KF slice,
    # and the client applies it (reference: Mapit::Pull/ReplyPull,
    # src/Mapit.cc:164-196)
    from swarmmap_tpu import MAP_BASE

    sst = med.store
    k2 = sst.add_keyframe(
        pose_cw=new_pose,
        K=settings.camera.K,
        kp_uv=rng.rand(sst.n_kp, 2).astype(np.float32) * 100,
        kp_octave=np.zeros(sst.n_kp, np.int32),
        kp_angle=np.zeros(sst.n_kp, np.float32),
        kp_response=np.ones(sst.n_kp, np.float32),
        kp_valid=np.ones(sst.n_kp, bool),
        desc=rng.randint(0, 2**32, (sst.n_kp, 8), dtype=np.uint32),
        gid=5 * MAP_BASE + 777,  # distinct from the client-pushed KF
    )
    m2 = sst.add_map_point(np.array([1, 0, 3.0]), sst.kf_desc[k2, 0],
                           ref_kf=k2, gid=5 * MAP_BASE + 778)
    sst.add_observation(m2, k2, 1)
    pulled_gid = int(sst.kf_gid[k2])
    assert pulled_gid not in agent.system.store.kf_by_gid
    assert svc.pull_map(timeout=10.0), "ReplyPull never arrived"
    cst = agent.system.store
    assert pulled_gid in cst.kf_by_gid
    kc = cst.kf_by_gid[pulled_gid]
    np.testing.assert_allclose(cst.kf_pose_cw[kc], new_pose, atol=1e-6)
    mc = cst.mp_by_gid[int(sst.mp_gid[m2])]
    np.testing.assert_allclose(cst.mp_pos[mc], [1, 0, 3.0], atol=1e-6)
    # pulls are idempotent reads: a second pull changes nothing
    n_kf, n_mp = cst.n_kf, cst.n_mp
    assert svc.pull_map(timeout=10.0)
    assert (cst.n_kf, cst.n_mp) == (n_kf, n_mp)

    svc.close()
    dispatch.stop()
    for s in services.values():
        s.stop()


def test_wire_mode_grammar(wire_mode):
    """Outbound payloads must carry the selected grammar; decode
    auto-sniffs either (mixed-swarm interop)."""
    from swarmmap_tpu.core.tracking import SystemState
    from swarmmap_tpu.sync import codec

    data = Request(1, 0, "PushMap", b"xx").encode()
    r = Request.decode(data)
    assert (r.src, r.dst, r.path, r.body) == (1, 0, "PushMap", b"xx")
    st = SystemState(location=np.zeros(3, np.float32), velocity_burst=False,
                     stable=True, n_tracked=42, lost_count=0)
    sdata = codec.encode_state(st)
    if wire_mode == "boost-text":
        assert data.startswith(b"22 serialization::archive")
        assert sdata.startswith(b"22 serialization::archive")
    back = codec.decode_state(sdata)
    assert back.n_tracked == 42 and back.stable
