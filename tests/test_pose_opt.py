import numpy as np
import jax.numpy as jnp

from swarmmap_tpu.ops import lie, pose_opt


def setup(rng, n=120, noise=0.5, outlier_frac=0.2):
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)], 1
    )
    K = np.array([[450.0, 0, 320], [0, 450.0, 240], [0, 0, 1]], np.float32)
    w = rng.randn(3) * 0.3
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    t = np.array([0.2, -0.1, 0.3])
    pc = pts @ R.T + t
    uv = (pc[:, :2] / pc[:, 2:3]) @ np.diag([450.0, 450.0]) + K[:2, 2]
    uv += rng.normal(0, noise, uv.shape)
    out = rng.rand(n) < outlier_frac
    uv[out] += rng.uniform(15, 60, (out.sum(), 2)) * rng.choice([-1, 1], (out.sum(), 2))
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = R
    T_true[:3, 3] = t
    return pts.astype(np.float32), uv.astype(np.float32), K, T_true, out


def pose_err(T_est, T_true):
    dR = T_est[:3, :3] @ T_true[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    dt = np.linalg.norm(T_est[:3, 3] - T_true[:3, 3])
    return ang, dt


def test_pose_optimize_converges_from_perturbed(rng):
    pts, uv, K, T_true, out = setup(rng)
    # perturb the true pose
    xi = np.concatenate([rng.randn(3) * 0.03, rng.randn(3) * 0.1]).astype(np.float32)
    T0 = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ T_true
    res = pose_opt.pose_optimize(
        jnp.asarray(T0), jnp.asarray(K), jnp.asarray(pts), jnp.asarray(uv),
        jnp.ones(len(pts), jnp.float32), jnp.asarray(~out | True),
    )
    ang, dt = pose_err(np.asarray(res.Tcw), T_true)
    assert ang < 0.3, ang
    assert dt < 0.03, dt
    inl = np.asarray(res.inliers)
    assert inl[~out].mean() > 0.9
    assert inl[out].mean() < 0.1


def test_pose_optimize_flags_outliers_only(rng):
    pts, uv, K, T_true, out = setup(rng, noise=0.3, outlier_frac=0.3)
    res = pose_opt.pose_optimize(
        jnp.asarray(T_true), jnp.asarray(K), jnp.asarray(pts), jnp.asarray(uv),
        jnp.ones(len(pts), jnp.float32), jnp.ones(len(pts), bool),
    )
    inl = np.asarray(res.inliers)
    assert inl[out].sum() == 0
    assert inl[~out].mean() > 0.95
