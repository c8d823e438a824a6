"""Boost text-archive codec tests (reference wire interop).

Fixtures are hand-constructed from the grammar documented in
docs/boost_wire.md (the container has no boost build to capture-replay
against; PARITY.md records that as the remaining certification step).
"""
import numpy as np

from swarmmap_tpu.core.tracking import SystemState
from swarmmap_tpu.sync import boost_text as bt
from swarmmap_tpu.sync.codec import Request
from swarmmap_tpu.sync.oplog import UpdateRecord, MapSlice


def test_request_fixture_decode():
    # header | Request class info (tracking=0 version=0) | src dst |
    # path "PushMap" | body "hello world" (raw bytes incl. space)
    raw = b"22 serialization::archive 17 0 0 3 1 7 PushMap 11 hello world"
    req = bt.decode_request(raw)
    assert req.src == 3 and req.dst == 1
    assert req.path == "PushMap"
    assert req.body == b"hello world"


def test_request_roundtrip_exact_bytes():
    req = Request(src=2, dst=0, path="ReportState", body=b"\x00\x01 binary \xff")
    enc = bt.encode_request(req)
    assert enc.startswith(b"22 serialization::archive 17 0 0 2 0 11 ReportState 11 ")
    back = bt.decode_request(enc)
    assert (back.src, back.dst, back.path, back.body) == (2, 0, "ReportState", req.body)


def test_system_state_fixture_decode():
    # SystemState info | cv::Mat info(0 0) cols=1 rows=3 type=5 cont=1
    # data 1.5 -2 0.25 | burst=1 stable=0 | nTracked=57 lostCount=4
    raw = (b"22 serialization::archive 17 0 0 0 0 1 3 5 1 "
           b"1.5 -2 0.25 1 0 57 4")
    st = bt.decode_state(raw)
    np.testing.assert_allclose(st.location, [1.5, -2.0, 0.25])
    assert st.velocity_burst is True and st.stable is False
    assert st.n_tracked == 57 and st.lost_count == 4


def test_system_state_roundtrip():
    st = SystemState(location=np.array([0.1, -3.25, 7.0], np.float32),
                     velocity_burst=False, stable=True, n_tracked=200,
                     lost_count=0)
    back = bt.decode_state(bt.encode_state(st))
    np.testing.assert_allclose(back.location, st.location, rtol=1e-6)
    assert back.stable and not back.velocity_burst
    assert back.n_tracked == 200 and back.lost_count == 0


def test_float_formats_match_cxx_ostream():
    w = bt._Writer()
    w.f32(1.0 / 3.0)
    w.f64(1.0 / 3.0)
    w.f32(1e10)
    toks = w.getvalue().split(b" ")[3:]
    assert toks[0] == b"0.333333343"          # %.9g of float(1/3)
    assert toks[1] == b"0.33333333333333331"  # %.17g of double(1/3)
    assert toks[2] == b"1e+10"


def test_update_records_roundtrip():
    recs = [
        UpdateRecord(1, "kf", "SetPose", 1000001, (np.eye(4, dtype=np.float32),)),
        UpdateRecord(2, "mp", "AddObservation", 2000005, (1000001, 37)),
        UpdateRecord(3, "mp", "EraseObservation", 2000005, (1000001,)),
        UpdateRecord(4, "mp", "Replace", 2000006, (2000005,)),
        UpdateRecord(5, "kf", "SetBadFlag", 1000002, (0,)),
        UpdateRecord(6, "mp", "SetLastTrackedTime", 2000005, (12.5,)),
        UpdateRecord(7, "map", "AddLoopClosing", 1, (1000003,)),
        UpdateRecord(8, "mp", "SetVisible", 2000005, (9,)),
    ]
    sl = MapSlice(map_id=1, kfs=[], mps=[], updates=recs, twl=None)
    back = bt.decode_slice(bt.encode_slice(sl), map_id=1)
    assert len(back.updates) == len(recs)
    for a, b in zip(recs, back.updates):
        assert (a.kind, a.func, a.target) == (b.kind, b.func, b.target)
        if a.func == "SetPose":
            np.testing.assert_allclose(a.args[0], b.args[0])
        elif a.func == "AddObservation":
            assert tuple(b.args) == (1000001, 37)


def test_trigger_funcs_encode_as_int_and_drop_on_decode():
    recs = [
        UpdateRecord(1, "mp", "ComputeDistinctiveDescriptors", 5,
                     (np.arange(8, dtype=np.uint32),)),
        UpdateRecord(2, "mp", "UpdateNormalAndDepth", 5,
                     (np.ones(3, np.float32), 0.5, 2.0)),
        UpdateRecord(3, "mp", "SetWorldPos", 5, (np.zeros((3, 1), np.float32),)),
    ]
    sl = MapSlice(map_id=0, kfs=[], mps=[], updates=recs, twl=None)
    back = bt.decode_slice(bt.encode_slice(sl))
    # triggers are recompute tokens on the reference side; our decoder
    # drops them (the store refreshes those quantities itself)
    assert [u.func for u in back.updates] == ["SetWorldPos"]


def _toy_slice():
    n_kp = 16
    rng = np.random.RandomState(7)
    kf = dict(
        gid=1000000, frame_id=3, ts=11.25, genuine=True, velocity=0.0,
        pose_cw=np.eye(4, dtype=np.float32),
        K=np.array([[458.0, 0, 367.0], [0, 457.0, 248.0], [0, 0, 1]], np.float32),
        hw=(480, 752),
        kp_uv=rng.uniform(0, 400, (n_kp, 2)).astype(np.float32),
        kp_octave=rng.randint(0, 8, n_kp).astype(np.int32),
        kp_angle=rng.uniform(0, 360, n_kp).astype(np.float32),
        kp_response=rng.rand(n_kp).astype(np.float32),
        kp_valid=np.ones(n_kp, bool),
        desc=rng.randint(0, 2**32, (n_kp, 8), dtype=np.uint32),
        mp_gids=np.array([2000000, -1] * (n_kp // 2), np.int64),
        parent_gid=-1,
    )
    mp = dict(
        gid=2000000, obs={1000000: 0},
        pos=np.array([1.0, -2.0, 5.0], np.float32),
        desc=rng.randint(0, 2**32, 8, dtype=np.uint32),
        normal=np.array([0.0, 0.0, 1.0], np.float32),
        min_dist=0.5, max_dist=4.0, ref_kf_gid=1000000,
        visible=3, found=2, created=10.0, last_tracked=11.0,
        cam_velocity=0.0,
    )
    ups = [UpdateRecord(9, "mp", "SetWorldPos", 2000000,
                        (np.array([1, 2, 3], np.float32),))]
    return MapSlice(map_id=1, kfs=[kf], mps=[mp], updates=ups, twl=None)


def test_map_slice_roundtrip():
    sl = _toy_slice()
    data = bt.encode_slice(sl)
    assert data.startswith(b"22 serialization::archive 17 ")
    back = bt.decode_slice(data)
    assert back.map_id == 1
    kf = back.kfs[0]
    assert kf["gid"] == 1000000 and kf["frame_id"] == 3
    np.testing.assert_allclose(kf["pose_cw"], np.eye(4))
    np.testing.assert_allclose(kf["K"], sl.kfs[0]["K"])
    np.testing.assert_allclose(kf["kp_uv"], sl.kfs[0]["kp_uv"], rtol=1e-6)
    np.testing.assert_array_equal(kf["desc"], sl.kfs[0]["desc"])
    np.testing.assert_array_equal(kf["mp_gids"], sl.kfs[0]["mp_gids"])
    mp = back.mps[0]
    assert mp["gid"] == 2000000 and mp["obs"] == {1000000: 0}
    np.testing.assert_allclose(mp["pos"], [1.0, -2.0, 5.0])
    np.testing.assert_array_equal(mp["desc"], sl.mps[0]["desc"])
    assert mp["visible"] == 3 and mp["found"] == 2
    assert back.updates[0].func == "SetWorldPos"


def test_map_slice_applies_to_store():
    """Decoded reference-format slices flow through the normal MapUpdater."""
    from swarmmap_tpu.core.map_store import MapStore
    from swarmmap_tpu.sync.oplog import Mapit

    sl = _toy_slice()
    back = bt.decode_slice(bt.encode_slice(sl))
    st = MapStore(map_id=1, n_kp=16, is_server=True)
    Mapit(st).apply_slice(back)
    assert len(st.kf_by_gid) == 1 and len(st.mp_by_gid) == 1
    m = st.mp_by_gid[2000000]
    # the SetWorldPos update record was applied after insertion
    np.testing.assert_allclose(st.mp_pos[m], [1.0, 2.0, 3.0])


def test_virtual_kf_sentinel_frame_id_roundtrips():
    """Virtual keyframes (map_enhancer.py) carry frame_id=-1; on the wire
    that is an unsigned wrap to ULONG_MAX (the reference's `long unsigned
    int mnFrameId`).  The decoder must unwrap it so the int64 store does
    not overflow on apply — regression for the boost-text soak crash."""
    from swarmmap_tpu.core.map_store import MapStore
    from swarmmap_tpu.sync.oplog import Mapit

    sl = _toy_slice()
    sl.kfs[0]["frame_id"] = -1
    sl.kfs[0]["genuine"] = False
    back = bt.decode_slice(bt.encode_slice(sl))
    assert back.kfs[0]["frame_id"] == -1
    st = MapStore(map_id=1, n_kp=16, is_server=True)
    Mapit(st).apply_slice(back)          # must not OverflowError
    k = st.kf_by_gid[1000000]
    assert int(st.kf_frame_id[k]) == -1


def test_binary_map_file_roundtrip():
    """The .bin map-file codec (boost binary archives, System::SaveMap
    layout): pointer aliasing between the element sets and the allMPs /
    allKFs maps must resolve through object tracking."""
    from swarmmap_tpu.sync import boost_bin as bb

    sl = _toy_slice()
    inv = [[1000000], [], [1000000]]
    data = bb.encode_map_bin(sl.kfs, sl.mps, inverted_file=inv)
    kfs, mps, inverted, max_id = bb.decode_map_bin(data)
    assert len(kfs) == 1 and len(mps) == 1
    assert max_id == 1000000
    np.testing.assert_allclose(kfs[0]["pose_cw"], np.eye(4))
    np.testing.assert_array_equal(kfs[0]["desc"], sl.kfs[0]["desc"])
    np.testing.assert_allclose(mps[0]["pos"], [1.0, -2.0, 5.0])
    assert mps[0]["obs"] == {1000000: 0}
    assert inverted == inv
    # the aliased second occurrences added no second body: the stream is
    # much smaller than two full bodies
    single = bb.encode_map_bin(sl.kfs, sl.mps)
    assert len(single) < 1.5 * len(bb.encode_map_bin(sl.kfs, []))


def test_reference_bin_map_loads_through_codec():
    """codec.decode_slice sniffs a reference .bin map file and imports it
    as a full MapSlice applyable to a store."""
    from swarmmap_tpu.core.map_store import MapStore
    from swarmmap_tpu.sync import boost_bin as bb
    from swarmmap_tpu.sync import codec
    from swarmmap_tpu.sync.oplog import Mapit

    sl = _toy_slice()
    data = bb.encode_map_bin(sl.kfs, sl.mps)
    back = codec.decode_slice(data)
    assert back.map_id == 1 and len(back.kfs) == 1 and len(back.mps) == 1
    st = MapStore(map_id=1, n_kp=16, is_server=True)
    Mapit(st).apply_slice(back)
    assert len(st.kf_by_gid) == 1 and len(st.mp_by_gid) == 1
    # our own msgpack slices still decode through the same entry
    own = codec.decode_slice(codec.encode_slice(sl))
    assert own.kfs[0]["gid"] == 1000000


def test_mediator_boost_bin_export(tmp_path):
    """AgentMediator.save_map(fmt="boost-bin") writes a reference-layout
    map file that decode_map_bin reads back."""
    from swarmmap_tpu.core.map_store import MapStore
    from swarmmap_tpu.server.mediator import AgentMediator
    from swarmmap_tpu.server.map_manager import MapManager
    from swarmmap_tpu.sync import boost_bin as bb
    from swarmmap_tpu.sync.oplog import Mapit
    from swarmmap_tpu.ops.vocab import default_vocabulary

    AgentMediator.registry.clear()
    med = AgentMediator(1, default_vocabulary(), MapManager(), n_kp=16)
    sl = _toy_slice()
    Mapit(med.store).apply_slice(sl)
    out = tmp_path / "map-server-1.bin"
    med.save_map(out, fmt="boost-bin")
    kfs, mps, inverted, max_id = bb.decode_map_bin(out.read_bytes())
    assert len(kfs) == 1 and len(mps) == 1
    assert kfs[0]["gid"] == 1000000
