"""Bundle adjustment convergence tests on synthetic problems
(SURVEY.md §4: 'BA convergence on synthetic problems')."""
import numpy as np
import jax.numpy as jnp

from swarmmap_tpu.ops import ba, lie
from swarmmap_tpu.utils.trajectory import umeyama_align


def make_ba_problem(rng, n_cams=8, n_pts=200, noise=0.5, n_fixed=2,
                    pose_jitter=0.02, pt_jitter=0.05, drop=0.3):
    """Cameras on an arc looking at a point cloud; ground truth + noisy init."""
    K = np.array([[450.0, 0, 320], [0, 450.0, 240], [0, 0, 1]], np.float32)
    pts_gt = np.stack(
        [rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(5, 9, n_pts)], 1
    ).astype(np.float32)
    Tcw_gt = np.zeros((n_cams, 4, 4), np.float32)
    for c in range(n_cams):
        w = np.array([0.0, 0.05 * (c - n_cams / 2), 0.0], np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        t = np.array([-0.4 * c + 0.8, 0.02 * c, 0.01 * c], np.float32)
        Tcw_gt[c, :3, :3] = R
        Tcw_gt[c, :3, 3] = t
        Tcw_gt[c, 3, 3] = 1.0

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        pc = pts_gt @ Tcw_gt[c, :3, :3].T + Tcw_gt[c, :3, 3]
        uv = (pc[:, :2] / pc[:, 2:3]) @ np.diag([450.0, 450.0]) + K[:2, 2]
        vis = (pc[:, 2] > 0.5) & (rng.rand(n_pts) > drop)
        for j in np.where(vis)[0]:
            obs_cam.append(c)
            obs_pt.append(j)
            obs_uv.append(uv[j] + rng.normal(0, noise, 2))
    O = len(obs_cam)

    # noisy initialization
    Tcw0 = Tcw_gt.copy()
    for c in range(n_fixed, n_cams):
        xi = np.concatenate(
            [rng.randn(3) * pose_jitter, rng.randn(3) * pose_jitter * 5]
        ).astype(np.float32)
        Tcw0[c] = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ Tcw_gt[c]
    pts0 = pts_gt + rng.normal(0, pt_jitter, pts_gt.shape).astype(np.float32)

    prob = ba.BAProblem(
        Tcw=jnp.asarray(Tcw0),
        K=jnp.asarray(np.repeat(K[None], n_cams, 0)),
        cam_fixed=jnp.asarray(np.arange(n_cams) < n_fixed),
        cam_valid=jnp.ones(n_cams, bool),
        pts=jnp.asarray(pts0),
        pt_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(np.array(obs_cam, np.int32)),
        obs_pt=jnp.asarray(np.array(obs_pt, np.int32)),
        obs_uv=jnp.asarray(np.array(obs_uv, np.float32)),
        obs_inv_sigma2=jnp.ones(O, jnp.float32),
        obs_valid=jnp.ones(O, bool),
    )
    return prob, Tcw_gt, pts_gt


def cam_errors(Tcw_est, Tcw_gt):
    angs, dts = [], []
    for a, b in zip(Tcw_est, Tcw_gt):
        dR = a[:3, :3] @ b[:3, :3].T
        angs.append(np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))))
        dts.append(np.linalg.norm(a[:3, 3] - b[:3, 3]))
    return np.array(angs), np.array(dts)


def _check_convergence(res, prob, Tcw_gt, pts_gt):
    Tcw_est = np.asarray(res.Tcw)
    angs, dts = cam_errors(Tcw_est, Tcw_gt)
    assert angs.max() < 0.15, angs
    assert dts.max() < 0.02, dts
    # points: compare with alignment-free error (gauge fixed by anchors)
    err = np.linalg.norm(np.asarray(res.pts) - pts_gt, axis=1)
    assert np.median(err) < 0.03
    assert np.asarray(res.obs_inlier).mean() > 0.95


def test_local_ba_dense_converges(rng):
    prob, Tcw_gt, pts_gt = make_ba_problem(rng)
    res = ba.bundle_adjust(prob, mode="dense")
    _check_convergence(res, prob, Tcw_gt, pts_gt)


def test_global_ba_cg_converges(rng):
    prob, Tcw_gt, pts_gt = make_ba_problem(rng, n_cams=12, n_pts=300)
    res = ba.bundle_adjust(prob, mode="cg", cg_iters=40)
    _check_convergence(res, prob, Tcw_gt, pts_gt)


def test_ba_prunes_outlier_observations(rng):
    prob, Tcw_gt, pts_gt = make_ba_problem(rng, noise=0.3)
    uv = np.asarray(prob.obs_uv).copy()
    n_o = len(uv)
    bad = rng.rand(n_o) < 0.15
    uv[bad] += rng.uniform(20, 60, (bad.sum(), 2))
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    res = ba.bundle_adjust(prob, mode="dense")
    inl = np.asarray(res.obs_inlier)
    assert inl[bad].mean() < 0.05
    assert inl[~bad].mean() > 0.9
    # and the solution should still be accurate
    angs, dts = cam_errors(np.asarray(res.Tcw), Tcw_gt)
    assert angs.max() < 0.3
    assert dts.max() < 0.04


def test_ba_respects_fixed_cameras(rng):
    prob, Tcw_gt, pts_gt = make_ba_problem(rng)
    res = ba.bundle_adjust(prob, mode="dense")
    np.testing.assert_array_equal(
        np.asarray(res.Tcw)[:2], np.asarray(prob.Tcw)[:2]
    )


def test_ba_handles_padding(rng):
    """Dead cameras/points/observations (validity masks) must not move."""
    prob, Tcw_gt, pts_gt = make_ba_problem(rng, n_cams=6, n_pts=100)
    # pad with 2 dead cams, 20 dead points, 50 dead observations
    C, P, O = 8, 120, len(np.asarray(prob.obs_cam)) + 50
    prob2 = ba.BAProblem(
        Tcw=jnp.concatenate([prob.Tcw, jnp.broadcast_to(jnp.eye(4), (2, 4, 4))]),
        K=jnp.concatenate([prob.K, prob.K[:2]]),
        cam_fixed=jnp.concatenate([prob.cam_fixed, jnp.zeros(2, bool)]),
        cam_valid=jnp.concatenate([prob.cam_valid, jnp.zeros(2, bool)]),
        pts=jnp.concatenate([prob.pts, jnp.zeros((20, 3))]),
        pt_valid=jnp.concatenate([prob.pt_valid, jnp.zeros(20, bool)]),
        obs_cam=jnp.concatenate([prob.obs_cam, jnp.zeros(50, jnp.int32)]),
        obs_pt=jnp.concatenate([prob.obs_pt, jnp.zeros(50, jnp.int32)]),
        obs_uv=jnp.concatenate([prob.obs_uv, jnp.zeros((50, 2))]),
        obs_inv_sigma2=jnp.concatenate([prob.obs_inv_sigma2, jnp.ones(50)]),
        obs_valid=jnp.concatenate([prob.obs_valid, jnp.zeros(50, bool)]),
    )
    res = ba.bundle_adjust(prob2, mode="dense")
    # dead cameras unchanged
    np.testing.assert_allclose(
        np.asarray(res.Tcw)[6:], np.broadcast_to(np.eye(4), (2, 4, 4)), atol=1e-6
    )
    # dead points unchanged
    np.testing.assert_allclose(np.asarray(res.pts)[100:], 0.0, atol=1e-6)
    # live cameras still converge
    angs, dts = cam_errors(np.asarray(res.Tcw)[:6], Tcw_gt)
    assert angs.max() < 0.5


def test_sharded_gba_matches_single_device(rng):
    """bundle_adjust_sharded (obs axis split over an 8-device mesh, psum
    reductions over the mesh axis) must converge like — and agree with —
    the single-device CG backend on the same problem (SURVEY.md §5:
    device-sharded server-side optimization)."""
    import jax
    from jax.sharding import Mesh

    prob, Tcw_gt, pts_gt = make_ba_problem(rng, n_cams=12, n_pts=300)
    # route through build_padded_problem: its power-of-two obs bucket
    # guarantees the shard split divides the 8-device mesh
    prob = ba.build_padded_problem(
        np.asarray(prob.Tcw), np.asarray(prob.K), np.asarray(prob.cam_fixed),
        np.asarray(prob.pts), np.asarray(prob.obs_cam),
        np.asarray(prob.obs_pt), np.asarray(prob.obs_uv),
        np.asarray(prob.obs_inv_sigma2),
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("obs",))
    res_s = ba.bundle_adjust_sharded(prob, mesh, cg_iters=40)
    res_1 = ba.bundle_adjust(prob, mode="cg", cg_iters=40)

    # convergence to ground truth (valid prefix only)
    angs, dts = cam_errors(np.asarray(res_s.Tcw)[:12], Tcw_gt)
    assert angs.max() < 0.15, angs
    assert dts.max() < 0.02, dts
    err = np.linalg.norm(np.asarray(res_s.pts)[:300] - pts_gt, axis=1)
    assert np.median(err) < 0.03

    # agreement with the single-device backend (same math; only psum
    # reduction order differs -> f32-level tolerance)
    np.testing.assert_allclose(
        np.asarray(res_s.Tcw)[:12], np.asarray(res_1.Tcw)[:12], atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(res_s.pts)[:300], np.asarray(res_1.pts)[:300], atol=5e-3)
    agree = (np.asarray(res_s.obs_inlier) == np.asarray(res_1.obs_inlier))
    assert agree.mean() > 0.99
