"""Protocol round-trip tests (SURVEY.md §4: serialize -> deserialize ->
apply), including the op-log aggregation policies."""
import numpy as np

from swarmmap_tpu.core.map_store import MapStore
from swarmmap_tpu.sync import codec
from swarmmap_tpu.sync.oplog import Mapit, MapSlice, UpdateRecord, full_archive


def make_store(map_id=0, n_kp=64):
    return MapStore(map_id=map_id, n_kp=n_kp, kf_capacity=8, mp_capacity=64)


def add_kf(st, pose_seed=0):
    rng = np.random.RandomState(pose_seed)
    n = st.n_kp
    return st.add_keyframe(
        pose_cw=np.eye(4, dtype=np.float32),
        K=np.array([[450, 0, 320], [0, 450, 240], [0, 0, 1]], np.float32),
        kp_uv=rng.rand(n, 2).astype(np.float32) * 200,
        kp_octave=rng.randint(0, 4, n),
        kp_angle=rng.rand(n).astype(np.float32) * 360,
        kp_response=rng.rand(n).astype(np.float32),
        kp_valid=np.ones(n, bool),
        desc=rng.randint(0, 2**32, (n, 8), dtype=np.uint32),
        ts=1.5, frame_id=7, hw=(480, 640),
    )


def test_push_applies_to_replica():
    client = make_store(map_id=3)
    mapit = Mapit(client)
    k = add_kf(client)
    m = client.add_map_point(np.array([1, 2, 3.0]), client.kf_desc[k, 0], ref_kf=k)
    client.add_observation(m, k, 0)

    sl = mapit.archive()
    assert len(sl.kfs) == 1 and len(sl.mps) == 1
    data = codec.encode_slice(sl)
    sl2 = codec.decode_slice(data)

    server = make_store(map_id=3)
    server_mapit = Mapit(server)
    server_mapit.apply_slice(sl2)
    assert server.n_kf == 1 and server.n_mp == 1
    np.testing.assert_array_equal(server.kf_desc[0], client.kf_desc[k])
    np.testing.assert_allclose(server.mp_pos[0], [1, 2, 3])
    # observation restored
    assert server.kf_kp_mp[0, 0] == 0
    assert 0 in server.obs[0]


def test_incremental_updates_flow():
    client = make_store(map_id=1)
    mapit = Mapit(client)
    k = add_kf(client)
    m = client.add_map_point(np.array([1, 2, 3.0]), client.kf_desc[k, 0], ref_kf=k)
    client.add_observation(m, k, 0)

    server = make_store(map_id=1)
    server_mapit = Mapit(server)
    server_mapit.apply_slice(codec.decode_slice(codec.encode_slice(mapit.archive())))

    # mutate AFTER the first push -> only updates ship
    new_pose = np.eye(4, dtype=np.float32)
    new_pose[0, 3] = 5.0
    client.set_kf_pose(k, new_pose)
    client.set_mp_pos(m, np.array([9.0, 9, 9]))
    sl = mapit.archive()
    assert len(sl.kfs) == 0 and len(sl.mps) == 0
    assert len(sl.updates) == 2
    server_mapit.apply_slice(codec.decode_slice(codec.encode_slice(sl)))
    assert server.kf_pose_cw[0][0, 3] == 5.0
    np.testing.assert_allclose(server.mp_pos[0], [9, 9, 9])


def test_updates_on_unshipped_elements_dropped():
    client = make_store()
    mapit = Mapit(client)
    k = add_kf(client)
    client.set_kf_pose(k, np.eye(4, dtype=np.float32))  # before any push
    assert len(mapit.log) == 0  # dropped: the KF ships whole anyway


def test_aggregation_last_writer_wins():
    client = make_store()
    mapit = Mapit(client)
    k = add_kf(client)
    mapit.archive()  # ship the KF so subsequent updates are logged
    for i in range(5):
        p = np.eye(4, dtype=np.float32)
        p[1, 3] = float(i)
        client.set_kf_pose(k, p)
    sl = mapit.archive()
    poses = [u for u in sl.updates if u.func == "SetPose"]
    assert len(poses) == 1
    assert poses[0].args[0][1, 3] == 4.0


def test_aggregation_drops_ops_on_dead_elements():
    client = make_store()
    mapit = Mapit(client)
    k1, k2 = add_kf(client, 0), add_kf(client, 1)
    m = client.add_map_point(np.array([0, 0, 1.0]), client.kf_desc[k1, 0], ref_kf=k1)
    client.add_observation(m, k1, 0)
    client.add_observation(m, k2, 0)
    mapit.archive()
    client.set_mp_pos(m, np.array([1.0, 1, 1]))
    client.set_mp_bad(m)
    sl = mapit.archive()
    funcs = [u.func for u in sl.updates if u.target == int(client.mp_gid[m])]
    assert "SetBadFlag" in funcs
    assert "SetWorldPos" not in funcs


def test_out_of_order_restoration_queue():
    """An AddObservation arriving before its map point parks in the
    restoration queue and applies on the next slice (Map.cc:401-423)."""
    server = make_store(map_id=2)
    server_mapit = Mapit(server)
    client = make_store(map_id=2)
    client_mapit = Mapit(client)
    k = add_kf(client)
    m = client.add_map_point(np.array([1.0, 1, 1]), client.kf_desc[k, 0], ref_kf=k)
    sl_full = client_mapit.archive()

    # slice 1: keyframe only + an observation referencing the unseen point
    sl1 = MapSlice(map_id=2, kfs=sl_full.kfs, mps=[], updates=[
        UpdateRecord(0, "mp", "AddObservation", int(client.mp_gid[m]),
                     (int(client.kf_gid[k]), 5)),
    ])
    server_mapit.apply_slice(codec.decode_slice(codec.encode_slice(sl1)))
    assert server.n_mp == 0
    assert len(server.pending_obs) == 1

    # slice 2: the map point arrives -> queue drains
    sl2 = MapSlice(map_id=2, kfs=[], mps=sl_full.mps, updates=[])
    server_mapit.apply_slice(codec.decode_slice(codec.encode_slice(sl2)))
    assert server.n_mp == 1
    assert server.kf_kp_mp[0, 5] == 0
    assert not server.pending_obs


def test_map_event_callback():
    client = make_store()
    mapit = Mapit(client)
    k = add_kf(client)
    client.log_fn("map", "AddLoopClosing", int(client.kf_gid[k]), ())
    sl = mapit.archive()
    events = []
    server = make_store()
    Mapit(server).apply_slice(
        codec.decode_slice(codec.encode_slice(sl)),
        on_map_event=lambda f, t, a: events.append((f, t)),
    )
    assert events == [("AddLoopClosing", int(client.kf_gid[k]))]


def test_full_archive_checkpoint_roundtrip(tmp_path):
    client = make_store(map_id=4)
    Mapit(client)
    k1, k2 = add_kf(client, 0), add_kf(client, 1)
    for i in range(10):
        m = client.add_map_point(
            np.array([i, 0, 2.0]), client.kf_desc[k1, i], ref_kf=k1
        )
        client.add_observation(m, k1, i)
        client.add_observation(m, k2, i)
    path = tmp_path / "map-client-4.bin"
    path.write_bytes(codec.encode_slice(full_archive(client)))

    restored = make_store(map_id=4)
    Mapit(restored).apply_slice(codec.decode_slice(path.read_bytes()))
    assert restored.n_kf == 2 and restored.n_mp == 10
    np.testing.assert_allclose(restored.mp_pos[:10], client.mp_pos[:10])
    # covisibility rebuilt from observations
    assert restored.covis[0][1] == 10


def test_request_roundtrip():
    r = codec.Request(src=1, dst=0, path="PushMap", body=b"\x00\x01payload")
    r2 = codec.Request.decode(r.encode())
    assert (r2.src, r2.dst, r2.path, r2.body) == (1, 0, "PushMap", b"\x00\x01payload")


def test_system_state_roundtrip():
    from swarmmap_tpu.core.tracking import SystemState

    s = SystemState(location=np.array([1, 2, 3.0], np.float32),
                    velocity_burst=True, stable=False, n_tracked=42, lost_count=3)
    s2 = codec.decode_state(codec.encode_state(s))
    assert s2.velocity_burst and not s2.stable
    assert s2.n_tracked == 42 and s2.lost_count == 3
    np.testing.assert_allclose(s2.location, [1, 2, 3])


def _pose(R=None, t=(0, 0, 0)):
    T = np.eye(4, dtype=np.float32)
    if R is not None:
        T[:3, :3] = R
    T[:3, 3] = t
    return T


def test_stale_gauge_slice_reexpressed():
    """A push created before a server-side loop correction (old gauge)
    is re-expressed in the corrected frame instead of reverting it."""
    # client and server replica sharing two keyframes + a point
    client = make_store(map_id=0)
    cm = Mapit(client)
    k0 = add_kf(client, 0)
    k1 = add_kf(client, 1)
    client.set_kf_pose(k1, _pose(t=(1.0, 0, 0)), log=False)
    m = client.add_map_point(np.array([0.5, 0, 3.0]), client.kf_desc[k0, 0],
                             ref_kf=k0)
    client.add_observation(m, k0, 0)
    server = make_store(map_id=0)
    sm = Mapit(server)
    sm.apply_slice(codec.decode_slice(codec.encode_slice(cm.archive())))

    # server-side correction: rigid shift of the whole map by +1 in z
    # (as a loop correction would), with bookkeeping like correct_loop's
    shift = np.array([0, 0, 1.0], np.float32)
    for k in (0, 1):
        server.kf_pre_corr_pose[k] = server.kf_pose_cw[k]
        server.kf_corrected[k] = True
        server.kf_corr_scale[k] = 1.0
        T = server.kf_pose_cw[k].copy()
        T[:3, 3] += shift
        server.set_kf_pose(k, T, log=False)
        server.kf_post_corr_pose[k] = T
    server.mp_pre_corr_pos[0] = server.mp_pos[0]
    server.mp_corrected[0] = True
    server.set_mp_pos(0, server.mp_pos[0] - shift, log=False)
    server.mp_post_corr_pos[0] = server.mp_pos[0]
    server.gauge_epoch = 1  # the correction bumps the epoch

    # stale client push: small refinements + a NEW keyframe and point,
    # all still in the old gauge
    client.set_kf_pose(k0, _pose(t=(0.01, 0, 0)))       # tiny refinement
    client.set_kf_pose(k1, _pose(t=(1.02, 0, 0)))
    client.set_mp_pos(m, np.array([0.52, 0, 3.0], np.float32))
    k2 = add_kf(client, 2)
    client.set_kf_pose(k2, _pose(t=(2.0, 0, 0)), log=False)
    client.kf_parent[k2] = k1
    m2 = client.add_map_point(np.array([1.5, 0, 3.0]), client.kf_desc[k2, 0],
                              ref_kf=k1)
    client.add_observation(m2, k2, 1)
    sl = codec.decode_slice(codec.encode_slice(cm.archive()))
    sm.apply_slice(sl)

    # existing keyframes: refinement carried onto the CORRECTED gauge
    np.testing.assert_allclose(
        server.kf_pose_cw[0][:3, 3], [0.01, 0, 1.0], atol=1e-5)
    np.testing.assert_allclose(
        server.kf_pose_cw[1][:3, 3], [1.02, 0, 1.0], atol=1e-5)
    # existing point: corrected position + client delta
    np.testing.assert_allclose(
        server.mp_pos[0], [0.52, 0, 2.0], atol=1e-5)
    # new keyframe anchored via its parent's pre->post transform
    k2s = server.kf_by_gid[int(client.kf_gid[k2])]
    np.testing.assert_allclose(
        server.kf_pose_cw[k2s][:3, 3], [2.0, 0, 1.0], atol=1e-5)
    # new point mapped through its ref keyframe's correction
    m2s = server.mp_by_gid[int(client.mp_gid[m2])]
    np.testing.assert_allclose(server.mp_pos[m2s], [1.5, 0, 2.0], atol=1e-4)


def test_fresh_slice_retires_stale_gauge_guard():
    """Once the client has applied the correction distribute, its pushes
    match the corrected gauge and the guard clears."""
    client = make_store(map_id=0)
    cm = Mapit(client)
    k0 = add_kf(client, 0)
    server = make_store(map_id=0)
    sm = Mapit(server)
    sm.apply_slice(codec.decode_slice(codec.encode_slice(cm.archive())))
    shift = np.array([0, 0, 1.0], np.float32)
    server.kf_pre_corr_pose[0] = server.kf_pose_cw[0]
    server.kf_corrected[0] = True
    T = server.kf_pose_cw[0].copy()
    T[:3, 3] += shift
    server.set_kf_pose(0, T, log=False)
    server.kf_post_corr_pose[0] = T
    server.gauge_epoch = 1
    # client receives the correction (as the distribute would deliver:
    # corrected pose + the new gauge epoch stamped on the slice)
    client.set_kf_pose(k0, T, log=False)
    client.gauge_epoch = 1
    # ... and pushes a post-correction refinement
    T2 = T.copy()
    T2[:3, 3] += [0.01, 0, 0]
    client.set_kf_pose(k0, T2)
    sm.apply_slice(codec.decode_slice(codec.encode_slice(cm.archive())))
    np.testing.assert_allclose(server.kf_pose_cw[0], T2, atol=1e-6)
    assert not server.kf_corrected[0]


def test_stale_gauge_cumulative_slices_do_not_compound():
    """Successive stale slices carry CUMULATIVE client payloads; each
    must conjugate onto the fixed post-correction snapshot — composing
    onto the live pose would double-apply the deltas and blow up the
    gauge (observed: a 5x scale collapse at campaign scale)."""
    client = make_store(map_id=0)
    cm = Mapit(client)
    k0 = add_kf(client, 0)
    server = make_store(map_id=0)
    sm = Mapit(server)
    sm.apply_slice(codec.decode_slice(codec.encode_slice(cm.archive())))
    shift = np.array([0, 0, 1.0], np.float32)
    server.kf_pre_corr_pose[0] = server.kf_pose_cw[0]
    T = server.kf_pose_cw[0].copy()
    T[:3, 3] += shift
    server.set_kf_pose(0, T, log=False)
    server.kf_post_corr_pose[0] = T
    server.kf_corrected[0] = True
    server.gauge_epoch = 1
    # three successive stale pushes, each with a LARGER cumulative
    # refinement in the old gauge
    for i, dx in enumerate((0.05, 0.10, 0.15)):
        client.set_kf_pose(k0, _pose(t=(dx, 0, 0)))
        sm.apply_slice(codec.decode_slice(codec.encode_slice(cm.archive())))
        np.testing.assert_allclose(
            server.kf_pose_cw[0][:3, 3], [dx, 0, 1.0], atol=1e-5,
            err_msg=f"slice {i}: cumulative delta compounded")


def _rot_z(deg):
    c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def test_stale_gauge_rotational_correction():
    """A correction with a real ROTATION (+scale): the stale SetWorldPos
    refinement delta must be rotated through the pre->post Sim3, not
    applied translation-only (regression: the delta was folded in as
    post + (x - pre)/s, wrong direction after any rotated correction)."""
    client = make_store(map_id=0)
    cm = Mapit(client)
    k0 = add_kf(client, 0)
    p0 = np.array([0.5, 0.2, 3.0], np.float32)
    m = client.add_map_point(p0.copy(), client.kf_desc[k0, 0], ref_kf=k0)
    client.add_observation(m, k0, 0)
    server = make_store(map_id=0)
    sm = Mapit(server)
    sm.apply_slice(codec.decode_slice(codec.encode_slice(cm.archive())))

    # correction: pre pose = identity, post pose rotated 90 deg about z,
    # translated, with Sim3 scale 2 (as a monocular loop closure yields)
    Rc = _rot_z(90.0)
    tc = np.array([0.3, -0.1, 0.4], np.float32)
    scl = 2.0
    T_post = _pose(R=Rc, t=tc)
    server.kf_pre_corr_pose[0] = server.kf_pose_cw[0]
    server.kf_corrected[0] = True
    server.kf_corr_scale[0] = scl
    server.set_kf_pose(0, T_post, log=False)
    server.kf_post_corr_pose[0] = T_post
    # point correction with the same Sim3 (correct_loop math:
    # p' = Rc^T (p_cam/s - t_se3), pre cam pose = identity)
    server.mp_pre_corr_pos[0] = server.mp_pos[0]
    server.mp_corrected[0] = True
    p_post = Rc.T @ (p0 / scl - tc)
    server.set_mp_pos(0, p_post.astype(np.float32), log=False)
    server.mp_post_corr_pos[0] = server.mp_pos[0]
    server.gauge_epoch = 1

    # stale push: the client refines the point by d in the OLD gauge
    d = np.array([0.06, -0.02, 0.03], np.float32)
    client.set_mp_pos(m, p0 + d)
    # ... and the keyframe by a small translation
    client.set_kf_pose(k0, _pose(t=(0.01, 0.02, 0)))
    sm.apply_slice(codec.decode_slice(codec.encode_slice(cm.archive())))

    # expected point: post + Rc^T Rp d / s  (Rp = identity here)
    np.testing.assert_allclose(
        server.mp_pos[0], p_post + (Rc.T @ d) / scl, atol=1e-5)
    # expected pose: client delta (vs pre) conjugated onto post with the
    # translation rescaled
    delta = _pose(t=(0.01 / scl, 0.02 / scl, 0))
    np.testing.assert_allclose(
        server.kf_pose_cw[0], (delta @ T_post).astype(np.float32), atol=1e-5)


def test_new_elements_only_push_classified_stale_by_epoch():
    """The deep-queue case: a backlogged stale push carrying ONLY new
    elements has no SetPose records to vote with — the gauge epoch on
    the slice classifies it stale anyway and its geometry is
    re-expressed (regression: 0 stale vs 0 fresh votes => 'fresh',
    old-gauge geometry inserted verbatim and the guard wiped)."""
    client = make_store(map_id=0)
    cm = Mapit(client)
    k0 = add_kf(client, 0)
    server = make_store(map_id=0)
    sm = Mapit(server)
    sm.apply_slice(codec.decode_slice(codec.encode_slice(cm.archive())))
    shift = np.array([0, 0, 1.0], np.float32)
    server.kf_pre_corr_pose[0] = server.kf_pose_cw[0]
    server.kf_corrected[0] = True
    T = server.kf_pose_cw[0].copy()
    T[:3, 3] += shift
    server.set_kf_pose(0, T, log=False)
    server.kf_post_corr_pose[0] = T
    server.gauge_epoch = 1

    # push with ONLY a new keyframe (child of the corrected one) + a new
    # point, all in the old gauge — zero update records
    cm.log = []  # drop any stray refinement records: new elements only
    k1 = add_kf(client, 1)
    client.set_kf_pose(k1, _pose(t=(1.0, 0, 0)), log=False)
    client.kf_parent[k1] = k0
    m = client.add_map_point(np.array([0.5, 0, 3.0]), client.kf_desc[k1, 0],
                             ref_kf=k0)
    client.add_observation(m, k1, 0)
    sl = codec.decode_slice(codec.encode_slice(cm.archive()))
    assert not sl.updates or all(
        u.func != "SetPose" for u in sl.updates)  # really vote-free
    sm.apply_slice(sl)

    k1s = server.kf_by_gid[int(client.kf_gid[k1])]
    np.testing.assert_allclose(
        server.kf_pose_cw[k1s][:3, 3], [1.0, 0, 1.0], atol=1e-5)
    ms = server.mp_by_gid[int(client.mp_gid[m])]
    np.testing.assert_allclose(server.mp_pos[ms], [0.5, 0, 2.0], atol=1e-4)
    assert server.kf_corrected[0]  # guard NOT retired by a stale slice


def test_legacy_no_vote_slice_assumed_stale():
    """Epoch-less slices (reference peer on the boost wire) with the
    guard armed and no SetPose votes default to STALE, not fresh."""
    client = make_store(map_id=0)
    cm = Mapit(client)
    k0 = add_kf(client, 0)
    server = make_store(map_id=0)
    sm = Mapit(server)
    sm.apply_slice(codec.decode_slice(codec.encode_slice(cm.archive())))
    shift = np.array([0, 0, 1.0], np.float32)
    server.kf_pre_corr_pose[0] = server.kf_pose_cw[0]
    server.kf_corrected[0] = True
    T = server.kf_pose_cw[0].copy()
    T[:3, 3] += shift
    server.set_kf_pose(0, T, log=False)
    server.kf_post_corr_pose[0] = T
    server.gauge_epoch = 1

    k1 = add_kf(client, 1)
    client.set_kf_pose(k1, _pose(t=(1.0, 0, 0)), log=False)
    client.kf_parent[k1] = k0
    sl = codec.decode_slice(codec.encode_slice(cm.archive()))
    sl.epoch = None  # what a reference peer's boost-text slice carries
    sm.apply_slice(sl)
    k1s = server.kf_by_gid[int(client.kf_gid[k1])]
    np.testing.assert_allclose(
        server.kf_pose_cw[k1s][:3, 3], [1.0, 0, 1.0], atol=1e-5)
    assert server.kf_corrected[0]
