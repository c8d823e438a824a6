import numpy as np
import jax
import jax.numpy as jnp

from swarmmap_tpu.ops import lie, pose_graph, sim3_opt


def test_optimize_sim3_refines_noisy_init(rng):
    n = 60
    K = jnp.asarray([[450.0, 0, 320], [0, 450.0, 240], [0, 0, 1]], jnp.float32)
    pc2 = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)], 1
    ).astype(np.float32)
    xi_true = np.array([0.1, -0.2, 0.15, 0.4, 0.1, -0.3, 0.2], np.float32)
    R, t, s = (np.asarray(x) for x in lie.sim3_exp(jnp.asarray(xi_true)))
    pc1 = (s * pc2 @ R.T + t).astype(np.float32)
    uv1 = np.array(sim3_opt._project(K, jnp.asarray(pc1)))
    uv2 = np.array(sim3_opt._project(K, jnp.asarray(pc2)))
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)
    # noisy init
    xi0 = xi_true + rng.normal(0, 0.03, 7).astype(np.float32)
    R0, t0, s0 = lie.sim3_exp(jnp.asarray(xi0))
    res = sim3_opt.optimize_sim3(
        s0, R0, t0,
        jnp.asarray(pc1), jnp.asarray(pc2),
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
        jnp.ones(n, bool), K, K,
    )
    assert int(res.n_inliers) > n * 0.9
    assert abs(float(res.s) - s) < 0.01
    np.testing.assert_allclose(np.asarray(res.R), R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=2e-2)


def _chain_nodes(rng, n, drift=0.0):
    """Ground-truth chain of Siw poses + noisy odometry measurements."""
    xi_steps = rng.normal(0, 0.15, (n - 1, 7)).astype(np.float32)
    xi_steps[:, 6] *= 0.1
    R = [np.eye(3, dtype=np.float32)]
    t = [np.zeros(3, np.float32)]
    s = [np.float32(1.0)]
    for i in range(n - 1):
        dR, dt, ds = (np.asarray(x) for x in lie.sim3_exp(jnp.asarray(xi_steps[i])))
        R2, t2, s2 = (np.asarray(x) for x in lie.sim3_mul(
            jnp.asarray(dR), jnp.asarray(dt), jnp.asarray(ds),
            jnp.asarray(R[-1]), jnp.asarray(t[-1]), jnp.asarray(s[-1]),
        ))
        R.append(R2); t.append(t2); s.append(np.float32(s2))
    return np.stack(R), np.stack(t), np.stack(s)


def _rel(Ri, ti, si, Rj, tj, sj):
    """S_ji = S_jw * S_iw^-1  (pose of node i in node j's frame)."""
    Rinv, tinv, sinv = lie.sim3_inv(jnp.asarray(Ri), jnp.asarray(ti), jnp.asarray(si))
    return lie.sim3_mul(jnp.asarray(Rj), jnp.asarray(tj), jnp.asarray(sj), Rinv, tinv, sinv)


def test_optimize_sim3_points_edge_semantics(rng):
    """EdgeSim3RelativeXYZ analogue (reference:
    include/g2o/EdgeSim3RelativeXYZ.h): residual = p1 - Twl.map(p2); the
    optimizer must recover a ground-truth Sim3 from noisy matched 3D
    pairs with outliers, pruning them at chi2 > th2 like
    Optimizer::OptimizeSim3ByKeyFrame (Optimizer.cc:1591-1625)."""
    n = 120
    p2 = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    w = rng.normal(0, 0.2, 3)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    s_gt, t_gt = 1.35, np.array([0.4, -1.2, 2.0], np.float32)
    p1 = (s_gt * p2 @ R_gt.T + t_gt).astype(np.float32)
    p1 += rng.normal(0, 0.01, p1.shape).astype(np.float32)
    out = rng.rand(n) < 0.2
    p1[out] += rng.uniform(1.0, 3.0, (out.sum(), 3)).astype(np.float32)

    # residual semantics at the ground truth: near zero for inliers
    res = p1 - (s_gt * p2 @ R_gt.T + t_gt)
    assert np.abs(res[~out]).max() < 0.05
    assert np.abs(res[out]).max() > 0.5

    # perturbed init
    R0 = np.asarray(lie.so3_exp(jnp.asarray(w + rng.normal(0, 0.05, 3), jnp.float32)))
    opt = sim3_opt.optimize_sim3_points(
        jnp.asarray(1.2, jnp.float32), jnp.asarray(R0, jnp.float32),
        jnp.asarray(t_gt + rng.normal(0, 0.2, 3), jnp.float32),
        jnp.asarray(p1), jnp.asarray(p2), jnp.ones(n, bool),
        chi2_th=0.05,
    )
    assert abs(float(opt.s) - s_gt) < 0.01
    dR = np.asarray(opt.R) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang
    np.testing.assert_allclose(np.asarray(opt.t), t_gt, atol=0.03)
    inl = np.asarray(opt.inliers)
    assert inl[~out].mean() > 0.95 and inl[out].mean() < 0.05


def test_pose_graph_closes_loop(rng):
    """Drifted chain + one loop-closure edge -> graph snaps back."""
    n = 12
    R_gt, t_gt, s_gt = _chain_nodes(rng, n)
    # corrupt nodes 1..n-1 with accumulated drift
    R0, t0, s0 = [R_gt[0]], [t_gt[0]], [s_gt[0]]
    for i in range(1, n):
        noise = rng.normal(0, 0.02, 7).astype(np.float32) * i / n
        noise[6] *= 0.5
        dR, dt, ds = (np.asarray(x) for x in lie.sim3_exp(jnp.asarray(noise)))
        R2, t2, s2 = (np.asarray(x) for x in lie.sim3_mul(
            jnp.asarray(dR), jnp.asarray(dt), jnp.asarray(ds),
            jnp.asarray(R_gt[i]), jnp.asarray(t_gt[i]), jnp.asarray(s_gt[i]),
        ))
        R0.append(R2); t0.append(t2); s0.append(np.float32(s2))
    R0, t0, s0 = np.stack(R0), np.stack(t0), np.stack(s0)

    # edges: consecutive odometry (true relatives) + loop edge (0, n-1)
    ei, ej, mR, mt, ms = [], [], [], [], []
    for i in range(n - 1):
        Rr, tr, sr = _rel(R_gt[i], t_gt[i], s_gt[i], R_gt[i + 1], t_gt[i + 1], s_gt[i + 1])
        ei.append(i); ej.append(i + 1)
        mR.append(np.asarray(Rr)); mt.append(np.asarray(tr)); ms.append(float(sr))
    Rr, tr, sr = _rel(R_gt[0], t_gt[0], s_gt[0], R_gt[n - 1], t_gt[n - 1], s_gt[n - 1])
    ei.append(0); ej.append(n - 1)
    mR.append(np.asarray(Rr)); mt.append(np.asarray(tr)); ms.append(float(sr))

    fixed = np.zeros(n, bool); fixed[0] = True
    out = pose_graph.optimize_pose_graph(
        pose_graph.Sim3Nodes(jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(s0)),
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(mR), jnp.float32), jnp.asarray(np.stack(mt), jnp.float32),
        jnp.asarray(ms, jnp.float32),
        jnp.ones(len(ei), bool), jnp.asarray(fixed), jnp.ones(n, bool),
    )
    # all nodes should be close to ground truth after optimization
    for i in range(n):
        dR = np.asarray(out.R)[i] @ R_gt[i].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.5, (i, ang)
        assert np.linalg.norm(np.asarray(out.t)[i] - t_gt[i]) < 0.05, i
        assert abs(float(np.asarray(out.s)[i]) - s_gt[i]) < 0.02, i


def test_pose_graph_keeps_fixed_node(rng):
    n = 5
    R_gt, t_gt, s_gt = _chain_nodes(rng, n)
    ei = list(range(n - 1)); ej = list(range(1, n))
    mR, mt, ms = [], [], []
    for i in range(n - 1):
        Rr, tr, sr = _rel(R_gt[i], t_gt[i], s_gt[i], R_gt[i + 1], t_gt[i + 1], s_gt[i + 1])
        mR.append(np.asarray(Rr)); mt.append(np.asarray(tr)); ms.append(float(sr))
    fixed = np.zeros(n, bool); fixed[0] = True
    out = pose_graph.optimize_pose_graph(
        pose_graph.Sim3Nodes(jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(s_gt)),
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(mR), jnp.float32), jnp.asarray(np.stack(mt), jnp.float32),
        jnp.asarray(ms, jnp.float32),
        jnp.ones(n - 1, bool), jnp.asarray(fixed), jnp.ones(n, bool),
    )
    np.testing.assert_allclose(np.asarray(out.R)[0], R_gt[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.t)[0], t_gt[0], atol=1e-5)
