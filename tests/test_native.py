"""Native C++ component tests (vs python reference behavior)."""
import numpy as np
import pytest

from swarmmap_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_octree_respects_budget(lib, rng):
    n = 500
    xs = rng.uniform(0, 640, n)
    ys = rng.uniform(0, 480, n)
    rs = rng.rand(n)
    keep = native.distribute_octree(xs, ys, rs, (0, 0, 640, 480), 100)
    assert 80 <= keep.sum() <= 140  # node count overshoots budget slightly


def test_octree_spatial_spread(lib, rng):
    """Two dense clusters + sparse background: quadtree keeps points from
    everywhere, not just the strongest cluster."""
    a = rng.normal([100, 100], 5, (300, 2))
    b = rng.normal([500, 400], 5, (300, 2))
    c = np.stack([rng.uniform(0, 640, 50), rng.uniform(0, 480, 50)], 1)
    pts = np.concatenate([a, b, c])
    rs = np.concatenate([np.full(300, 10.0), np.full(300, 5.0), np.ones(50)])
    keep = native.distribute_octree(pts[:, 0], pts[:, 1], rs, (0, 0, 640, 480), 60)
    kept = pts[keep]
    assert keep.sum() >= 40
    # background points must survive (spread), despite lowest responses
    assert (keep[600:]).sum() >= 20


def test_octree_single_kp_per_node(lib):
    xs = np.array([10.0, 630.0])
    ys = np.array([10.0, 470.0])
    rs = np.array([1.0, 2.0])
    keep = native.distribute_octree(xs, ys, rs, (0, 0, 640, 480), 10)
    assert keep.sum() == 2


def test_covisibility_matches_python(lib, rng):
    n_kf, n_kp = 12, 64
    kf_mp = rng.randint(-1, 40, (n_kf, n_kp)).astype(np.int32)
    alive = np.ones(n_kf, np.uint8)
    i, j, c = native.covisibility(kf_mp, alive, min_shared=2)
    # python fallback result
    lib_backup, native._lib = native._lib, None
    native._build_failed = True
    try:
        i2, j2, c2 = native.covisibility(kf_mp, alive, min_shared=2)
    finally:
        native._lib = lib_backup
        native._build_failed = False
    got = {(a, b): cc for a, b, cc in zip(i.tolist(), j.tolist(), c.tolist())}
    want = {(a, b): cc for a, b, cc in zip(i2.tolist(), j2.tolist(), c2.tolist())}
    assert got == want


def test_aggregate_oplog(lib):
    import ctypes

    # funcs: 0=SetPose (last-writer), 1=AddObservation, 2=SetBadFlag
    kind = np.array([0, 0, 0, 1, 1, 1], np.int32)
    func = np.array([0, 0, 1, 0, 1, 2], np.int32)
    target = np.array([7, 7, 7, 9, 9, 9], np.int64)
    last_writer = np.array([1, 0, 0], np.uint8)
    is_bad = np.array([0, 0, 1], np.uint8)
    keep = np.zeros(6, np.uint8)
    kept = lib.aggregate_oplog(kind, func, target, 6, last_writer, is_bad, keep)
    # record 0 superseded by record 1 (same kind/func/target, last wins)
    assert keep.tolist() == [0, 1, 1, 0, 0, 1]
    assert kept == 3


def test_redundancy_native_matches_fallback(lib, rng):
    n_kf, n_kp = 12, 64
    kf_mp = rng.randint(-1, 40, (n_kf, n_kp)).astype(np.int32)
    kf_oct = rng.randint(0, 8, (n_kf, n_kp)).astype(np.int32)
    alive = rng.rand(n_kf) > 0.2
    cands = np.arange(1, n_kf, dtype=np.int32)
    t1, r1 = native.redundancy(kf_mp, kf_oct, alive, cands)
    # force the python fallback through a temporary lib outage
    saved, native._lib = native._lib, None
    savedf, native._build_failed = native._build_failed, True
    try:
        t2, r2 = native.redundancy(kf_mp, kf_oct, alive, cands)
    finally:
        native._lib, native._build_failed = saved, savedf
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(r1, r2)


def test_aggregate_keep_last_writer(lib):
    # three SetPose on target 7 -> only the LAST survives; SetBadFlag on
    # target 3 kills its earlier op but not itself
    kind = np.zeros(6, np.int32)
    func = np.array([0, 0, 1, 0, 2, 1], np.int32)  # 0=SetPose 1=Other 2=SetBadFlag
    target = np.array([7, 7, 3, 7, 3, 9], np.int64)
    lw = np.array([1, 0, 0], np.uint8)
    bf = np.array([0, 0, 1], np.uint8)
    keep = native.aggregate_keep(kind, func, target, lw, bf)
    np.testing.assert_array_equal(keep, [False, False, False, True, True, True])
