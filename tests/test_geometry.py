import numpy as np
import jax
import jax.numpy as jnp

from swarmmap_tpu.ops import pnp, sim3, triangulate as tri, twoview
from swarmmap_tpu.utils.trajectory import quat_to_rot


def make_scene(rng, n=200, planar=False):
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)], 1
    )
    if planar:
        pts[:, 2] = 6.0 + 0.3 * pts[:, 0]  # a slanted plane
    K = np.array([[450.0, 0, 320], [0, 450.0, 240], [0, 0, 1]])
    return pts, K


def project(K, R, t, pts):
    pc = pts @ R.T + t
    uv = pc[:, :2] / pc[:, 2:3]
    return uv @ np.diag([K[0, 0], K[1, 1]]) + K[:2, 2], pc[:, 2]


def small_rotation(rng, mag=0.1):
    from swarmmap_tpu.ops import lie
    return np.asarray(lie.so3_exp(jnp.asarray(rng.randn(3) * mag, jnp.float32)))


def test_triangulate_exact(rng):
    pts, K = make_scene(rng, 50)
    R = small_rotation(rng)
    t = np.array([0.8, 0.05, 0.02])
    uv1, _ = project(K, np.eye(3), np.zeros(3), pts)
    uv2, _ = project(K, R, t, pts)
    P1 = K @ np.eye(4)[:3]
    T2 = np.eye(4); T2[:3, :3] = R; T2[:3, 3] = t
    P2 = K @ T2[:3]
    got = np.asarray(
        tri.triangulate(jnp.asarray(P1, jnp.float32), jnp.asarray(P2, jnp.float32),
                        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32))
    )
    np.testing.assert_allclose(got, pts, atol=2e-2)


def test_twoview_reconstruct_general(rng):
    pts, K = make_scene(rng, 300)
    R = small_rotation(rng, 0.05)
    t = np.array([0.6, 0.0, 0.05])
    uv1, _ = project(K, np.eye(3), np.zeros(3), pts)
    uv2, _ = project(K, R, t, pts)
    uv1 += rng.normal(0, 0.4, uv1.shape)
    uv2 += rng.normal(0, 0.4, uv2.shape)
    valid = np.ones(300, bool)
    rec = twoview.reconstruct(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(valid), jnp.asarray(K, jnp.float32), jax.random.PRNGKey(0),
    )
    assert bool(rec.success)
    R_est = np.asarray(rec.R21)
    t_est = np.asarray(rec.t21)
    # rotation error
    dR = R_est @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0, ang
    # translation direction error
    cos = abs(t_est @ t / np.linalg.norm(t))
    assert cos > 0.995, cos
    # triangulated points match up to the global scale
    inl = np.asarray(rec.inliers)
    assert inl.sum() > 200
    scale = np.median(np.asarray(rec.pts3d)[inl][:, 2] / pts[inl][:, 2])
    err = np.abs(np.asarray(rec.pts3d)[inl] / scale - pts[inl])
    assert np.median(err) < 0.05
    assert (err < 0.5).mean() > 0.99


def test_twoview_rejects_pure_rotation(rng):
    pts, K = make_scene(rng, 300)
    R = small_rotation(rng, 0.08)
    uv1, _ = project(K, np.eye(3), np.zeros(3), pts)
    uv2, _ = project(K, R, np.zeros(3), pts)  # no baseline -> no parallax
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)
    rec = twoview.reconstruct(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(np.ones(300, bool)), jnp.asarray(K, jnp.float32),
        jax.random.PRNGKey(1),
    )
    assert not bool(rec.success)


def test_twoview_planar_uses_homography(rng):
    pts, K = make_scene(rng, 300, planar=True)
    R = small_rotation(rng, 0.05)
    t = np.array([0.5, 0.1, 0.0])
    uv1, _ = project(K, np.eye(3), np.zeros(3), pts)
    uv2, _ = project(K, R, t, pts)
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)
    rec = twoview.reconstruct(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(np.ones(300, bool)), jnp.asarray(K, jnp.float32),
        jax.random.PRNGKey(2),
    )
    assert bool(np.asarray(rec.used_h))
    if bool(rec.success):
        dR = np.asarray(rec.R21) @ R.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 2.0


def test_ransac_pnp(rng):
    pts, K = make_scene(rng, 150)
    R = small_rotation(rng, 0.4)
    t = np.array([0.3, -0.2, 0.5])
    uv, z = project(K, R, t, pts)
    uv += rng.normal(0, 0.5, uv.shape)
    # 30% outliers
    out = rng.rand(150) < 0.3
    uv[out] += rng.uniform(30, 100, (out.sum(), 2))
    res = pnp.ransac_pnp(
        jnp.asarray(pts, jnp.float32), jnp.asarray(uv, jnp.float32),
        jnp.asarray(np.ones(150, bool)), jnp.asarray(K, jnp.float32),
        jax.random.PRNGKey(3),
    )
    assert bool(res.success)
    T = np.asarray(res.Tcw)
    dR = T[:3, :3] @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0, ang
    assert np.linalg.norm(T[:3, 3] - t) < 0.1
    inl = np.asarray(res.inliers)
    assert inl[~out].mean() > 0.9
    assert inl[out].mean() < 0.1


def test_epnp_beats_dlt_under_noise(rng):
    """Reloc-style benchmark (reference: PnPsolver.cc EPnP): over noisy,
    outlier-ridden trials the EPnP minimal solver must succeed at least
    as often as the round-1 DLT-6 stand-in, with comparable accuracy."""
    import jax

    wins = {"epnp": 0, "dlt": 0}
    errs = {"epnp": [], "dlt": []}
    n = 60
    for trial in range(8):
        pts, K = make_scene(rng, n)
        R = small_rotation(rng, 0.5)
        t = np.array([0.4, -0.3, 0.6]) + rng.normal(0, 0.1, 3)
        uv, _ = project(K, R, t, pts)
        uv += rng.normal(0, 1.0, uv.shape)          # heavy pixel noise
        out = rng.rand(n) < 0.4                      # 40% outliers
        uv[out] += rng.uniform(25, 90, (out.sum(), 2))
        for solver in ("epnp", "dlt"):
            res = pnp.ransac_pnp(
                jnp.asarray(pts, jnp.float32), jnp.asarray(uv, jnp.float32),
                jnp.asarray(np.ones(n, bool)), jnp.asarray(K, jnp.float32),
                jax.random.PRNGKey(100 + trial), min_inliers=15,
                solver=solver,
            )
            if bool(res.success):
                T = np.asarray(res.Tcw)
                dR = T[:3, :3] @ R.T
                ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
                if ang < 3.0 and np.linalg.norm(T[:3, 3] - t) < 0.2:
                    wins[solver] += 1
                    errs[solver].append(ang)
    assert wins["epnp"] >= wins["dlt"], (wins, errs)
    assert wins["epnp"] >= 6, (wins, errs)


def test_umeyama_recovers_sim3(rng):
    src = rng.randn(40, 3)
    R = small_rotation(rng, 0.7)
    s_true, t_true = 1.7, np.array([0.3, -1.0, 2.0])
    dst = s_true * src @ R.T + t_true
    s, R_est, t_est = sim3.umeyama(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32))
    assert abs(float(s) - s_true) < 1e-3
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_est), t_true, atol=1e-3)


def test_ransac_sim3_with_outliers(rng):
    n = 80
    K = np.array([[450.0, 0, 320], [0, 450.0, 240], [0, 0, 1]])
    pc2 = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)], 1
    )
    R = small_rotation(rng, 0.5)
    s_true, t_true = 1.3, np.array([0.5, 0.1, 0.4])
    pc1 = s_true * pc2 @ R.T + t_true
    out = rng.rand(n) < 0.25
    pc1[out] += rng.uniform(1.0, 3.0, (out.sum(), 3))
    res = sim3.ransac_sim3(
        jnp.asarray(pc1, jnp.float32), jnp.asarray(pc2, jnp.float32),
        jnp.asarray(np.ones(n, bool)), jnp.asarray(K, jnp.float32),
        jnp.asarray(K, jnp.float32), jax.random.PRNGKey(4),
    )
    assert bool(res.success)
    assert abs(float(res.s) - s_true) < 0.05
    np.testing.assert_allclose(np.asarray(res.R), R, atol=0.02)
    assert np.asarray(res.inliers)[~out].mean() > 0.85
