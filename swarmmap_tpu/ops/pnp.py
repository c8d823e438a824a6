"""Batched RANSAC PnP for relocalization (device).

Reference spec: PnPsolver (/root/reference/code/src/PnPsolver.cc) — EPnP
minimal solves inside an adaptive RANSAC loop.

TPU formulation: fixed-size hypothesis bank (SURVEY.md §7.1 — "RANSAC as
fixed-iteration batched hypothesis scoring").  The minimal solver here is
the 6-point DLT camera resection with orthonormalization of the rotation
(instead of EPnP's control-point parametrization — same O(1) linear
algebra, simpler to batch; accuracy is recovered by the LM pose
refinement that follows every successful RANSAC in the tracking flow,
exactly as the reference refines with PoseOptimization).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

N_HYPOTHESES = 256
MIN_SET = 6


def _solve_dlt(pts: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """[6,3] world points + [6,2] *normalized* image coords -> Tcw [4,4]."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    u, v = uv[:, 0], uv[:, 1]
    o = jnp.ones_like(x)
    zr = jnp.zeros_like(x)
    r1 = jnp.stack([x, y, z, o, zr, zr, zr, zr, -u * x, -u * y, -u * z, -u], 1)
    r2 = jnp.stack([zr, zr, zr, zr, x, y, z, o, -v * x, -v * y, -v * z, -v], 1)
    A = jnp.concatenate([r1, r2], 0)  # [12,12]
    _, _, vt = jnp.linalg.svd(A)
    P = vt[11].reshape(3, 4)
    M = P[:, :3]
    # sign: points must be in front (positive depth for the centroid)
    c = pts.mean(0)
    sgn = jnp.sign(M[2] @ c + P[2, 3])
    P = P * jnp.where(sgn == 0, 1.0, sgn)
    M = P[:, :3]
    # orthonormalize M -> R, recover scale for t
    U, s, Vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    R = U @ jnp.diag(jnp.array([1.0, 1.0, d])) @ Vt
    scale = jnp.mean(s) * jnp.where(d == 0, 1.0, 1.0)
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    T = jnp.eye(4, dtype=pts.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
    return T


class PnPResult(NamedTuple):
    success: jnp.ndarray
    Tcw: jnp.ndarray       # [4,4]
    inliers: jnp.ndarray   # [N] bool


import functools


@functools.partial(
    jax.jit, static_argnames=("chi2_th", "min_inliers")
)
def ransac_pnp(
    pts_w: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    key: jax.Array,
    sigma2: jnp.ndarray | float = 1.0,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
) -> PnPResult:
    """[N,3] world points vs [N,2] pixels -> camera pose.

    All hypotheses solved and scored in one batch; the winner is the
    hypothesis with most chi2 inliers."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    norm_uv = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], 1)

    count = jnp.maximum(valid.sum(), MIN_SET)
    order = jnp.argsort(~valid)
    draws = jax.random.randint(key, (N_HYPOTHESES, MIN_SET), 0, count)
    sets = order[draws]

    T_batch = jax.vmap(lambda s: _solve_dlt(pts_w[s], norm_uv[s]))(sets)

    def score(T):
        pc = (T[:3, :3] @ pts_w.T).T + T[:3, 3]
        z = pc[:, 2]
        pu = fx * pc[:, 0] / jnp.maximum(z, 1e-9) + cx
        pv = fy * pc[:, 1] / jnp.maximum(z, 1e-9) + cy
        e2 = ((pu - uv[:, 0]) ** 2 + (pv - uv[:, 1]) ** 2) / sigma2
        inl = valid & (z > 0) & (e2 < chi2_th)
        return inl.sum(), inl

    # stage 1: loose gate to find the most promising hypothesis — minimal
    # DLT poses are noisy, so strict chi2 would starve every hypothesis
    def loose_score(T):
        pc = (T[:3, :3] @ pts_w.T).T + T[:3, 3]
        z = pc[:, 2]
        pu = fx * pc[:, 0] / jnp.maximum(z, 1e-9) + cx
        pv = fy * pc[:, 1] / jnp.maximum(z, 1e-9) + cy
        e2 = ((pu - uv[:, 0]) ** 2 + (pv - uv[:, 1]) ** 2) / sigma2
        inl = valid & (z > 0) & (e2 < 100.0 * chi2_th)
        return inl.sum(), inl

    n_loose, loose = jax.vmap(loose_score)(T_batch)
    best = jnp.argmax(n_loose)

    # stage 2: LM refinement on the loose inliers (the reference refines
    # every RANSAC winner with PoseOptimization too, Tracking.cc:1138+)
    from .pose_opt import pose_optimize

    inv_s2 = jnp.ones(pts_w.shape[0], pts_w.dtype) / sigma2
    res = pose_optimize(
        T_batch[best], K, pts_w, uv, inv_s2, loose[best],
        rounds=3, iters=8, chi2_th=chi2_th,
    )
    n_in, inls = score(res.Tcw)
    ok = n_in >= min_inliers
    return PnPResult(success=ok, Tcw=res.Tcw, inliers=inls)
