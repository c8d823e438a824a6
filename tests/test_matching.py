import numpy as np
import jax.numpy as jnp

from swarmmap_tpu.ops import hamming, matching, vocab


def np_hamming(a, b):
    return np.unpackbits(
        np.bitwise_xor(a[:, None, :], b[None, :, :]).view(np.uint8), axis=-1
    ).sum(-1)


def test_hamming_matrix_matches_numpy(rng):
    a = rng.randint(0, 2**32, (37, 8), dtype=np.uint32)
    b = rng.randint(0, 2**32, (53, 8), dtype=np.uint32)
    got = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, np_hamming(a, b))


def test_hamming_pairs(rng):
    a = rng.randint(0, 2**32, (20, 8), dtype=np.uint32)
    b = rng.randint(0, 2**32, (20, 8), dtype=np.uint32)
    got = np.asarray(hamming.hamming_pairs(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([np_hamming(a[i : i + 1], b[i : i + 1])[0, 0] for i in range(20)])
    np.testing.assert_array_equal(got, want)


def _flip_bits(desc, n, rng):
    """Flip n random bits of each [8]u32 descriptor row."""
    out = desc.copy()
    for i in range(len(desc)):
        for _ in range(n):
            bit = rng.randint(256)
            out[i, bit // 32] ^= np.uint32(1) << np.uint32(bit % 32)
    return out


def test_masked_match_finds_correspondences(rng):
    n = 64
    t_desc = rng.randint(0, 2**32, (n, 8), dtype=np.uint32)
    perm = rng.permutation(n)
    q_desc = _flip_bits(t_desc[perm], 10, rng)  # noisy copies
    mask = np.ones((n, n), bool)
    m = matching.masked_match(
        jnp.asarray(q_desc), jnp.asarray(t_desc), jnp.asarray(mask),
        max_dist=matching.TH_LOW, ratio=0.75,
    )
    idx, valid = np.asarray(m.idx), np.asarray(m.valid)
    assert valid.sum() > n * 0.9
    assert (idx[valid] == perm[valid]).all()


def test_masked_match_respects_mask(rng):
    t_desc = rng.randint(0, 2**32, (16, 8), dtype=np.uint32)
    q_desc = t_desc.copy()  # identical -> would match diagonally
    mask = np.zeros((16, 16), bool)  # but nothing allowed
    m = matching.masked_match(jnp.asarray(q_desc), jnp.asarray(t_desc), jnp.asarray(mask))
    assert not np.asarray(m.valid).any()


def test_conflict_resolution(rng):
    # two queries both closest to target 0; only the closer keeps it
    t_desc = np.zeros((4, 8), np.uint32)
    t_desc[1:] = 0xFFFFFFFF
    q0 = np.zeros((1, 8), np.uint32)            # dist 0 to target 0
    q1 = q0.copy(); q1[0, 0] = 1                # dist 1 to target 0
    q_desc = np.concatenate([q1, q0])
    mask = np.ones((2, 4), bool)
    m = matching.masked_match(jnp.asarray(q_desc), jnp.asarray(t_desc), jnp.asarray(mask))
    valid = np.asarray(m.valid)
    assert valid[1] and not valid[0]


def test_rotation_consistency(rng):
    # 90 matches at ~10deg, 10 outliers spread far away
    rot = np.concatenate([rng.normal(10, 1.0, 90), rng.uniform(100, 350, 10)])
    valid = np.ones(100, bool)
    keep = np.asarray(matching.rotation_consistency(jnp.asarray(rot), jnp.asarray(valid)))
    assert keep[:90].mean() > 0.95
    assert keep[90:].sum() <= 3  # at most the 2 runner-up bins survive


def test_window_mask():
    q_uv = jnp.asarray([[10.0, 10.0]])
    t_uv = jnp.asarray([[12.0, 11.0], [30.0, 10.0]])
    m = np.asarray(
        matching.window_mask(
            q_uv, t_uv, 5.0, jnp.ones(1, bool), jnp.ones(2, bool)
        )
    )
    assert m[0, 0] and not m[0, 1]


def test_predicted_octave():
    # at max observation distance -> level 0; closer -> finer levels exist
    d = jnp.asarray([10.0, 10.0 / 1.2**3])
    mx = jnp.asarray([10.0, 10.0])
    lvl = np.asarray(matching.predicted_octave(d, mx, 1.2, 8))
    assert lvl[0] == 0 and lvl[1] == 3


def test_vocab_transform_consistency(rng):
    descs = rng.randint(0, 2**32, (2000, 8), dtype=np.uint32)
    voc = vocab.Vocabulary.train(descs[:1500], k=6, L=3, seed=1)
    w_np, n_np = voc.transform_np(descs[:64])
    w_dev, n_dev = voc.transform(jnp.asarray(descs[:64]))
    np.testing.assert_array_equal(w_np, np.asarray(w_dev))
    np.testing.assert_array_equal(n_np, np.asarray(n_dev))


def test_vocab_scoring_discriminates(rng):
    descs = rng.randint(0, 2**32, (3000, 8), dtype=np.uint32)
    voc = vocab.Vocabulary.train(descs, k=8, L=3, seed=2)
    frame_a = descs[:200]
    frame_a2 = _flip_bits(frame_a, 8, rng)       # same place, noisy
    frame_b = descs[1000:1200]                   # different place
    wa, _ = voc.transform_np(frame_a)
    wa2, _ = voc.transform_np(frame_a2)
    wb, _ = voc.transform_np(frame_b)
    va, va2, vb = (voc.bow_vector(w) for w in (wa, wa2, wb))
    s_same = vocab.Vocabulary.score(va, va2)
    s_diff = vocab.Vocabulary.score(va, vb)
    assert s_same > s_diff + 0.1, (s_same, s_diff)
    assert abs(vocab.Vocabulary.score(va, va) - 1.0) < 1e-6


def test_vocab_dbow2_text_roundtrip(tmp_path, rng):
    """Interop format: save/load through the DBoW2 text layout preserves
    the transform exactly."""
    descs = rng.randint(0, 2**32, (1500, 8), dtype=np.uint32)
    voc = vocab.Vocabulary.train(descs, k=5, L=3, seed=1)
    p = tmp_path / "voc.txt"
    voc.save_dbow2_txt(p)
    voc2 = vocab.Vocabulary.load_dbow2_txt(p)
    w1, n1 = voc.transform_np(descs[:128])
    w2, n2 = voc2.transform_np(descs[:128])
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(n1, n2)
    # header sanity
    head = p.read_text().split("\n")[0].split()
    assert head[0] == "5" and head[1] == "3"


def test_vocab_dbow2_binary_roundtrip(tmp_path, rng):
    """Interop: the reference ORBvoc.bin binary node layout
    (TemplatedVocabulary.h:1478 spec) round-trips exactly."""
    descs = rng.randint(0, 2**32, (1200, 8), dtype=np.uint32)
    voc = vocab.Vocabulary.train(descs, k=4, L=3, seed=9)
    p = tmp_path / "voc.bin"
    voc.save_dbow2_bin(p)
    # header sanity: 41-byte records
    raw = p.read_bytes()
    import struct
    nb_nodes, size_node, k, L, sc, wt = struct.unpack("<IIiiii", raw[:24])
    assert size_node == 41 and k == 4 and L == 3
    assert len(raw) == 24 + (nb_nodes - 1) * 41
    voc2 = vocab.Vocabulary.load_dbow2_bin(p)
    w1, n1 = voc.transform_np(descs[:128])
    w2, n2 = voc2.transform_np(descs[:128])
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(n1, n2)


def test_vocab_save_load(tmp_path, rng):
    descs = rng.randint(0, 2**32, (500, 8), dtype=np.uint32)
    voc = vocab.Vocabulary.train(descs, k=4, L=2, seed=3)
    p = tmp_path / "voc.npz"
    voc.save(p)
    voc2 = vocab.Vocabulary.load(p)
    w1, n1 = voc.transform_np(descs[:32])
    w2, n2 = voc2.transform_np(descs[:32])
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(n1, n2)


def test_vocab_dbow2_binary_k10_L6_real_shape(tmp_path, rng):
    """The REAL ORBvoc.bin shape: k=10, L=6, ~1.1M nodes, 10^6 words
    (round-3 verdict: the loader had only been exercised on toy shapes;
    the real file is ~45 MB and the record loop must survive it)."""
    import struct

    k, L = 10, 6
    centers = [rng.randint(0, 2**32, (k**l, k, 8), dtype=np.uint32)
               for l in range(L)]
    valid = [np.ones((k**l, k), bool) for l in range(L)]
    weights = (rng.rand(k**L).astype(np.float32) + 1e-3)
    voc = vocab.Vocabulary(k=k, L=L, centers=centers, valid=valid,
                           word_weights=weights, node_level=4)
    p = tmp_path / "ORBvoc.bin"
    voc.save_dbow2_bin(p)
    raw_head = p.read_bytes()[:24]
    nb_nodes, size_node, kk, LL, _, _ = struct.unpack("<IIiiii", raw_head)
    n_expect = sum(k ** (l + 1) for l in range(L)) + 1  # full tree + root
    assert (nb_nodes, size_node, kk, LL) == (n_expect, 41, 10, 6)
    assert p.stat().st_size == 24 + (nb_nodes - 1) * 41  # ~45 MB

    voc2 = vocab.Vocabulary.load_dbow2_bin(p)
    assert voc2.k == 10 and voc2.L == 6
    for l in (0, 3, L - 1):
        np.testing.assert_array_equal(voc2.centers[l], centers[l])
    np.testing.assert_allclose(voc2.word_weights, weights, rtol=1e-6)
    descs = rng.randint(0, 2**32, (256, 8), dtype=np.uint32)
    w1, n1 = voc.transform_np(descs)
    w2, n2 = voc2.transform_np(descs)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(n1, n2)
