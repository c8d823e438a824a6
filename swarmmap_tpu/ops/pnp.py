"""Batched RANSAC PnP for relocalization (device).

Reference spec: PnPsolver (/root/reference/code/src/PnPsolver.cc) — EPnP
(Lepetit et al.) minimal solves inside an adaptive RANSAC loop.

TPU formulation: fixed-size hypothesis bank (SURVEY.md §7.1 — "RANSAC as
fixed-iteration batched hypothesis scoring").  The minimal solver is a
batched EPnP: 4 PCA control points, barycentric coordinates, the 12x12
M^T M nullspace (compute_ccs/compute_pcs, PnPsolver.cc:240-320), the
N=1 and N=2 beta cases solved in closed form / linear least squares
(find_betas_approx_1/2, :470-540), Kabsch alignment world->camera
(estimate_R_and_t, :560-610), best case picked by reprojection error.
A 6-point DLT resection is kept as a fallback solver for comparison
benchmarks.  Every RANSAC winner is LM-refined (the reference refines
with PoseOptimization after relocalization too, Tracking.cc:1138+).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

N_HYPOTHESES = 256
MIN_SET = 6


def _rigid_align(P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
    """Kabsch: find Tcw with Q ~ R P + t (P world, Q camera), no scale
    (reference: PnPsolver::estimate_R_and_t)."""
    cp, cq = P.mean(0), Q.mean(0)
    H = (P - cp).T @ (Q - cq)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    R = Vt.T @ D @ U.T
    t = cq - R @ cp
    return jnp.eye(4, dtype=P.dtype).at[:3, :3].set(R).at[:3, 3].set(t)


def _solve_epnp(pts: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """[S,3] world points + [S,2] *normalized* image coords -> Tcw [4,4]
    via EPnP with the N=1 and N=2 beta cases."""
    S = pts.shape[0]
    f32 = pts.dtype
    # control points: centroid + PCA axes (choose_control_points)
    c0 = pts.mean(0)
    Pc = pts - c0
    cov = Pc.T @ Pc / S
    w_eig, V = jnp.linalg.eigh(cov)
    sd = jnp.sqrt(jnp.maximum(w_eig, 1e-10))
    C = jnp.concatenate([c0[None], c0[None] + sd[:, None] * V.T], 0)  # [4,3]
    # barycentric coordinates (compute_barycentric_coordinates)
    M44 = jnp.concatenate([C.T, jnp.ones((1, 4), f32)], 0)
    A = jnp.linalg.solve(
        M44, jnp.concatenate([pts.T, jnp.ones((1, S), f32)], 0)
    ).T  # [S,4]
    # M matrix [2S,12] in normalized coords (fill_M with fx=fy=1, cx=cy=0)
    u, v = uv[:, 0], uv[:, 1]
    Z = jnp.zeros_like(A)
    M1 = jnp.stack([A, Z, -A * u[:, None]], -1).reshape(S, 12)
    M2 = jnp.stack([Z, A, -A * v[:, None]], -1).reshape(S, 12)
    M = jnp.concatenate([M1, M2], 0)
    _, Vn = jnp.linalg.eigh(M.T @ M)  # ascending eigenvalues
    v1 = Vn[:, 0].reshape(4, 3)  # nullspace basis
    v2 = Vn[:, 1].reshape(4, 3)

    # world control-point pairwise distances
    pi, pj = jnp.triu_indices(4, k=1)
    dC = jnp.linalg.norm(C[pi] - C[pj], axis=1)  # [6]

    def finish(Cc):
        # flip so points sit in front of the camera, then align
        Xc = A @ Cc
        sgn = jnp.sign(Xc[:, 2].sum())
        Xc = Xc * jnp.where(sgn == 0, 1.0, sgn)
        T = _rigid_align(pts, Xc)
        pc = pts @ T[:3, :3].T + T[:3, 3]
        pu = pc[:, 0] / jnp.maximum(pc[:, 2], 1e-9)
        pv = pc[:, 1] / jnp.maximum(pc[:, 2], 1e-9)
        err = jnp.sum((pu - u) ** 2 + (pv - v) ** 2)
        err = err + jnp.where(pc[:, 2].min() <= 0, 1e9, 0.0)
        return T, err

    # case N=1: single beta from distance consistency
    dv1 = jnp.linalg.norm(v1[pi] - v1[pj], axis=1)
    beta1 = jnp.sum(dv1 * dC) / jnp.maximum(jnp.sum(dv1 * dv1), 1e-12)
    T_a, err_a = finish(beta1 * v1)

    # case N=2: Cc = b1*v2 + b2*v1; solve [b11,b12,b22] by least squares
    # over the 6 distance constraints (find_betas_approx_2)
    d2 = v2[pi] - v2[pj]
    d1 = v1[pi] - v1[pj]
    L = jnp.stack(
        [jnp.sum(d2 * d2, 1), 2.0 * jnp.sum(d2 * d1, 1), jnp.sum(d1 * d1, 1)], 1
    )  # [6,3]
    rho = dC**2
    b, *_ = jnp.linalg.lstsq(L, rho)
    b11, b12, b22 = b[0], b[1], b[2]
    bb1 = jnp.sqrt(jnp.abs(b11))
    bb2 = jnp.sqrt(jnp.abs(b22)) * jnp.sign(b12) * jnp.sign(b11)
    T_b, err_b = finish(bb1 * v2 + bb2 * v1)

    return jnp.where(err_a <= err_b, T_a, T_b)


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

# top level, NOT inside ransac_pnp: importing under an active jit trace
# turns pose_opt's module-level jnp constants into leaked tracers
from .pose_opt import pose_optimize


@functools.partial(
    jax.jit, static_argnames=("chi2_th", "min_inliers", "solver")
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
    solver: str = "epnp",
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

    minimal = _solve_epnp if solver == "epnp" else _solve_dlt
    T_batch = jax.vmap(lambda s: minimal(pts_w[s], norm_uv[s]))(sets)

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
    inv_s2 = jnp.ones(pts_w.shape[0], pts_w.dtype) / sigma2
    res = pose_optimize(
        T_batch[best], K, pts_w, uv, inv_s2, loose[best],
        rounds=3, iters=8, chi2_th=chi2_th,
    )
    n_in, inls = score(res.Tcw)
    ok = n_in >= min_inliers
    return PnPResult(success=ok, Tcw=res.Tcw, inliers=inls)
