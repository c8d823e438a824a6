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
