"""Front-end golden tests: FAST / orientation / BRIEF vs. independent
numpy reference implementations of the same math (SURVEY.md §4 calls for
kernel-level golden tests the reference never had)."""
import numpy as np
import jax.numpy as jnp

from swarmmap_tpu.ops import brief, extractor, fast, orientation, pyramid
from swarmmap_tpu.utils import datasets


def numpy_fast_score(img: np.ndarray) -> np.ndarray:
    """Scalar-loop FAST-9 max-threshold score (ground truth)."""
    h, w = img.shape
    img = img.astype(np.float64)
    score = np.full((h, w), -np.inf)
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            c = img[y, x]
            d = np.array([img[y + dy, x + dx] - c for (dx, dy) in fast.CIRCLE])
            best = -np.inf
            for s in range(16):
                arc = [d[(s + k) % 16] for k in range(9)]
                best = max(best, min(arc), min(-a for a in arc))
            score[y, x] = best
    return score


def test_fast_score_matches_numpy(rng):
    img = rng.randint(0, 255, (48, 64)).astype(np.float32)
    got = np.asarray(fast.fast_score_map(jnp.asarray(img)))
    want = numpy_fast_score(img)
    inner = (slice(3, -3), slice(3, -3))
    np.testing.assert_allclose(got[inner], want[inner], atol=1e-3)


def test_fast_detects_blob_centers():
    img = np.full((96, 128), 20, np.float32)
    centers = [(30, 40), (60, 90), (50, 25)]
    for (y, x) in centers:
        yy, xx = np.mgrid[-4:5, -4:5]
        img[y - 4 : y + 5, x - 4 : x + 5] += 180 * np.exp(-(xx**2 + yy**2) / 6.0)
    kps = fast.detect_fast(jnp.asarray(img), 16, th_high=20.0, th_low=7.0)
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    for (y, x) in centers:
        d = np.abs(xy - np.array([x, y])).max(axis=1)
        assert d.min() <= 2.0, f"blob at {(x,y)} not detected: {xy}"


def test_fast_two_threshold_retry():
    """Weak corners pass only in tiles with no strong corner."""
    img = np.full((64, 64), 100, np.float32)
    img[16, 16] += 60   # strong corner, tile (0,0)
    img[16, 48] += 12   # weak corner, tile (1,x) — no strong corner there
    img[18, 18] += 12   # weak corner in the SAME tile as the strong one
    kps = fast.detect_fast(jnp.asarray(img), 8, th_high=20.0, th_low=7.0,
                           border=4, tile=32, cell=32)
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    has = lambda x, y: (np.abs(xy - np.array([x, y])).max(axis=1) < 1).any()
    assert has(16, 16)
    assert has(48, 16)
    assert not has(18, 18)


def numpy_ic_angle(img, x, y):
    r = orientation.HALF_PATCH
    umax = np.round(np.sqrt(np.maximum(r * r - np.arange(r + 1) ** 2, 0))).astype(int)
    m01 = m10 = 0.0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if abs(dx) <= umax[abs(dy)]:
                v = img[y + dy, x + dx]
                m10 += dx * v
                m01 += dy * v
    a = np.degrees(np.arctan2(m01, m10))
    return a + 360 if a < 0 else a


def test_ic_angle_matches_numpy(rng):
    img = rng.randint(0, 255, (64, 64)).astype(np.float32)
    pts = np.array([[20, 20], [30, 40], [40, 25]], np.float32)
    got = np.asarray(
        orientation.ic_angles(jnp.asarray(img), jnp.asarray(pts), jnp.ones(3, bool))
    )
    for i, (x, y) in enumerate(pts.astype(int)):
        want = numpy_ic_angle(img, x, y)
        diff = abs(got[i] - want) % 360
        assert min(diff, 360 - diff) < 0.1


def _structured_patch(rng, size=33):
    """Noise + a strong off-center blob: a well-conditioned intensity
    centroid (pure noise patches have a near-zero centroid and an
    arbitrarily unstable angle)."""
    img = rng.randint(0, 120, (size, size)).astype(np.float32)
    yy, xx = np.mgrid[:size, :size]
    img += 140 * np.exp(-((xx - size * 0.72) ** 2 + (yy - size * 0.45) ** 2) / 18.0)
    return np.clip(img, 0, 255)


def test_ic_angle_rotation_equivariance(rng):
    """Rotating the patch by 90deg rotates the angle by ~90deg."""
    img = _structured_patch(rng)
    img90 = np.rot90(img, k=-1).copy()  # clockwise
    a0 = float(
        orientation.ic_angles(
            jnp.asarray(img), jnp.asarray([[16.0, 16.0]]), jnp.ones(1, bool)
        )[0]
    )
    a1 = float(
        orientation.ic_angles(
            jnp.asarray(img90), jnp.asarray([[16.0, 16.0]]), jnp.ones(1, bool)
        )[0]
    )
    diff = (a1 - a0) % 360
    assert abs(diff - 90) < 6.0


def test_brief_rotation_invariance(rng):
    """Steered BRIEF: descriptor of a rotated patch (with rotated angle)
    stays close in Hamming distance; unrelated patches are far."""
    img = np.zeros((64, 64), np.float32)
    img[16:48, 16:48] = _structured_patch(rng, 32)
    img_s = np.asarray(pyramid.gaussian_blur(jnp.asarray(img)))
    rot = np.rot90(img, k=-1).copy()
    rot_s = np.asarray(pyramid.gaussian_blur(jnp.asarray(rot)))
    xy = jnp.asarray([[32.0, 32.0]])
    ok = jnp.ones(1, bool)
    a = orientation.ic_angles(jnp.asarray(img), xy, ok)
    a_r = orientation.ic_angles(jnp.asarray(rot), xy, ok)
    d0 = np.asarray(brief.compute_descriptors(jnp.asarray(img_s), xy, a, ok))
    d1 = np.asarray(brief.compute_descriptors(jnp.asarray(rot_s), xy, a_r, ok))
    other = np.asarray(
        brief.compute_descriptors(
            jnp.asarray(rot_s), jnp.asarray([[48.0, 16.0]]), a, ok
        )
    )
    ham = lambda p, q: bin(int(np.bitwise_xor(p, q).astype(np.uint32).view(np.uint32).sum()))  # noqa
    def hamming(p, q):
        return sum(bin(int(a ^ b)).count("1") for a, b in zip(p.ravel().tolist(), q.ravel().tolist()))
    d_same = hamming(d0, d1)
    d_diff = hamming(d0, other)
    assert d_same < 80, d_same
    assert d_diff > 80, d_diff


def test_brief_binned_matches_exact_at_bin_centers(rng):
    """At angles that ARE bin centers, the binned MXU path and the exact
    gather path sample identical pixels, so descriptors must be
    bit-identical on integral images (away from borders)."""
    img = np.round(rng.rand(96, 128).astype(np.float32) * 255.0)
    n = 32
    xy = np.stack(
        [rng.uniform(20, 108, n), rng.uniform(20, 76, n)], -1
    ).astype(np.float32)
    bins = rng.randint(0, brief.N_BINS, n)
    ang = bins.astype(np.float32) * (360.0 / brief.N_BINS)
    ok = jnp.ones(n, bool)
    d_exact = np.asarray(
        brief.compute_descriptors(jnp.asarray(img), jnp.asarray(xy),
                                  jnp.asarray(ang), ok))
    d_binned = np.asarray(
        brief.compute_descriptors_binned(jnp.asarray(img), jnp.asarray(xy),
                                         jnp.asarray(ang), ok))
    np.testing.assert_array_equal(d_exact, d_binned)


def test_brief_binned_rotation_invariance(rng):
    """Binned steering preserves the rotation-invariance property the
    exact path has (quantization noise ≤ half a bin = 5.6°)."""
    img = np.zeros((64, 64), np.float32)
    img[16:48, 16:48] = _structured_patch(rng, 32)
    img_s = np.asarray(pyramid.gaussian_blur(jnp.asarray(img)))
    rot = np.rot90(img, k=-1).copy()
    rot_s = np.asarray(pyramid.gaussian_blur(jnp.asarray(rot)))
    xy = jnp.asarray([[32.0, 32.0]])
    ok = jnp.ones(1, bool)
    a = orientation.ic_angles(jnp.asarray(img), xy, ok)
    a_r = orientation.ic_angles(jnp.asarray(rot), xy, ok)
    d0 = np.asarray(brief.compute_descriptors_binned(jnp.asarray(img_s), xy, a, ok))
    d1 = np.asarray(brief.compute_descriptors_binned(jnp.asarray(rot_s), xy, a_r, ok))
    other = np.asarray(
        brief.compute_descriptors_binned(
            jnp.asarray(rot_s), jnp.asarray([[48.0, 16.0]]), a, ok))

    def hamming(p, q):
        return sum(bin(int(a ^ b)).count("1")
                   for a, b in zip(p.ravel().tolist(), q.ravel().tolist()))

    assert hamming(d0, d1) < 80, hamming(d0, d1)
    assert hamming(d0, other) > 80, hamming(d0, other)


def test_unpack_bits_roundtrip(rng):
    desc = rng.randint(0, 2**32, (5, 8), dtype=np.uint32)
    bits = np.asarray(brief.unpack_bits(jnp.asarray(desc)))
    assert bits.shape == (5, 256)
    # popcount equivalence
    pc_bits = bits.sum(axis=1)
    pc_ref = np.array([sum(bin(v).count("1") for v in row) for row in desc])
    np.testing.assert_array_equal(pc_bits, pc_ref)


def test_extract_orb_end_to_end():
    seq = datasets.synthesize_sequence(n_frames=2, hw=(240, 320), n_points=150)
    feats = extractor.extract_orb(jnp.asarray(seq.read(0)), n_features=512, n_levels=4)
    valid = np.asarray(feats.valid)
    assert valid.sum() > 100, f"only {valid.sum()} keypoints on synthetic frame"
    xy = np.asarray(feats.xy)[valid]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 320).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 240).all()
    # descriptors of valid kps should mostly be nonzero
    desc = np.asarray(feats.desc)[valid]
    assert (desc.sum(axis=1) != 0).mean() > 0.9


def test_extract_orb_repeatability():
    """Same world point should be detected in consecutive frames."""
    seq = datasets.synthesize_sequence(n_frames=3, hw=(240, 320), n_points=150)
    f0 = extractor.extract_orb(jnp.asarray(seq.read(0)), n_features=512, n_levels=4)
    f1 = extractor.extract_orb(jnp.asarray(seq.read(1)), n_features=512, n_levels=4)
    assert int(np.asarray(f0.valid).sum()) > 80
    assert int(np.asarray(f1.valid).sum()) > 80


def test_opencv_learned_pattern(rng):
    """The OpenCV bit_pattern_31_ option: loads, stays within the patch
    bound, matches binned==exact at bin centers, and produces distinct
    descriptors from the synthetic pattern."""
    pat = brief.brief_pattern("opencv")
    assert pat.shape == (512, 2) and np.abs(pat).max() <= 13
    # the learned pattern is not the synthetic one
    assert not np.array_equal(pat, brief.brief_pattern("synthetic"))
    img = np.round(rng.rand(96, 128).astype(np.float32) * 255.0)
    n = 16
    xy = np.stack([rng.uniform(25, 100, n), rng.uniform(25, 70, n)], -1).astype(np.float32)
    ang = (rng.randint(0, brief.N_BINS, n) * (360.0 / brief.N_BINS)).astype(np.float32)
    ok = jnp.ones(n, bool)
    d_e = np.asarray(brief.compute_descriptors(
        jnp.asarray(img), jnp.asarray(xy), jnp.asarray(ang), ok, pattern="opencv"))
    d_b = np.asarray(brief.compute_descriptors_binned(
        jnp.asarray(img), jnp.asarray(xy), jnp.asarray(ang), ok, pattern="opencv"))
    np.testing.assert_array_equal(d_e, d_b)
    d_s = np.asarray(brief.compute_descriptors(
        jnp.asarray(img), jnp.asarray(xy), jnp.asarray(ang), ok, pattern="synthetic"))
    assert not np.array_equal(d_e, d_s)
    # end-to-end: extractor accepts the pattern switch
    f = extractor.extract_orb(jnp.asarray(img), n_features=128, n_levels=3,
                              desc_pattern="opencv")
    assert int(np.asarray(f.valid).sum()) > 0
