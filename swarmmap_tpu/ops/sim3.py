"""Sim(3) estimation (device).

Reference spec: Sim3Solver (/root/reference/code/src/Sim3Solver.cc) —
3-point RANSAC with Horn's closed form, used by loop closing; the
cross-map merge additionally uses Eigen::umeyama
(AgentMediator.cc:476-502).

TPU formulation: Umeyama (equivalent to Horn for minimal sets, least-
squares for full sets) as a batched closed form; RANSAC as one batched
hypothesis bank scored by symmetric reprojection error in both cameras.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

N_HYPOTHESES = 128


def umeyama(
    src: jnp.ndarray, dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = True,
):
    """Weighted similarity (s,R,t): dst ~ s R src + t. [N,3] x [N,3]."""
    if weights is None:
        weights = jnp.ones(src.shape[0], src.dtype)
    wsum = jnp.maximum(weights.sum(), 1e-9)
    wn = (weights / wsum)[:, None]
    mu_s = jnp.sum(src * wn, 0)
    mu_d = jnp.sum(dst * wn, 0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = (xd * wn).T @ xs
    U, D, Vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], src.dtype).at[2].set(sgn))
    R = U @ S @ Vt
    var_s = jnp.sum(jnp.sum(xs * xs, 1) * wn[:, 0])
    s = jnp.where(
        with_scale, jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, 1e-12), 1.0
    )
    t = mu_d - s * R @ mu_s
    return s, R, t


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    s: jnp.ndarray
    R: jnp.ndarray      # [3,3]: maps frame-2 coords into frame-1
    t: jnp.ndarray
    inliers: jnp.ndarray


def ransac_sim3(
    pc1: jnp.ndarray,
    pc2: jnp.ndarray,
    valid: jnp.ndarray,
    K1: jnp.ndarray,
    K2: jnp.ndarray,
    key: jax.Array,
    chi2_1: jnp.ndarray | float = 9.21,
    chi2_2: jnp.ndarray | float = 9.21,
    min_inliers: int = 20,
    fix_scale: bool = False,
) -> Sim3Result:
    """Matched camera-frame point sets [N,3] (pc1 in cam-1 frame, pc2 in
    cam-2 frame) -> S12 with inlier mask.

    Inlier test mirrors Sim3Solver::CheckInliers: project the transformed
    partner point into each camera, threshold squared pixel error."""
    count = jnp.maximum(valid.sum(), 3)
    order = jnp.argsort(~valid)
    draws = jax.random.randint(key, (N_HYPOTHESES, 3), 0, count)
    sets = order[draws]

    def solve(idx):
        return umeyama(pc2[idx], pc1[idx], with_scale=not fix_scale)

    s_b, R_b, t_b = jax.vmap(solve)(sets)

    def project(Km, pc):
        z = jnp.maximum(pc[:, 2], 1e-9)
        return jnp.stack(
            [Km[0, 0] * pc[:, 0] / z + Km[0, 2], Km[1, 1] * pc[:, 1] / z + Km[1, 2]],
            1,
        )

    uv1_obs = project(K1, pc1)
    uv2_obs = project(K2, pc2)

    def score(s, R, t):
        p2in1 = s * (pc2 @ R.T) + t
        sinv = 1.0 / jnp.maximum(s, 1e-12)
        p1in2 = sinv * ((pc1 - t) @ R)
        e1 = jnp.sum((project(K1, p2in1) - uv1_obs) ** 2, 1)
        e2 = jnp.sum((project(K2, p1in2) - uv2_obs) ** 2, 1)
        inl = valid & (e1 < chi2_1) & (e2 < chi2_2) & (p2in1[:, 2] > 0) & (p1in2[:, 2] > 0)
        return inl.sum(), inl

    n_in, inls = jax.vmap(score)(s_b, R_b, t_b)
    best = jnp.argmax(n_in)
    ok = n_in[best] >= min_inliers
    # least-squares refit on the winning inliers (umeyama over all)
    w = inls[best].astype(pc1.dtype)
    s_f, R_f, t_f = umeyama(pc2, pc1, weights=w, with_scale=not fix_scale)
    return Sim3Result(success=ok, s=s_f, R=R_f, t=t_f, inliers=inls[best])
