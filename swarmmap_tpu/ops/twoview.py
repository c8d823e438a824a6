"""Monocular two-view bootstrapping (device).

Reference spec: Initializer (/root/reference/code/src/Initializer.cc) —
parallel RANSAC of a homography H and a fundamental F over 200 minimal
sets, model selection by score ratio, motion recovery + triangulation
with cheirality/parallax checks.

TPU formulation: RANSAC becomes *batched hypothesis scoring* — all
minimal sets are solved and scored at once (a matmul-shaped argmax), no
early exit (SURVEY.md §7.1).  The reference's two CPU threads for H and F
dissolve: both hypothesis banks live in one traced program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import triangulate as tri

N_HYPOTHESES = 256
CHI2_F = 3.841
CHI2_H = 5.991
TH_SCORE = 5.991  # both models score with this cap (Initializer.cc)


def _normalize(uv: jnp.ndarray, valid: jnp.ndarray):
    """Isotropic normalization (mean 0, mean abs dev 1) as the reference."""
    n = jnp.maximum(valid.sum(), 1)
    mean = jnp.sum(jnp.where(valid[:, None], uv, 0.0), 0) / n
    d = jnp.where(valid[:, None], jnp.abs(uv - mean), 0.0)
    md = jnp.sum(d, 0) / n
    s = 1.0 / jnp.maximum(md, 1e-9)
    T = jnp.array(
        [[s[0], 0, -mean[0] * s[0]], [0, s[1], -mean[1] * s[1]], [0, 0, 1.0]],
        uv.dtype,
    )
    return (uv - mean) * s[None], T


def _solve_f(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """8-point algorithm on one minimal set: [8,2]x[8,2] -> F [3,3]."""
    x1, y1 = uv1[:, 0], uv1[:, 1]
    x2, y2 = uv2[:, 0], uv2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1
    )
    _, _, vt = jnp.linalg.svd(A)
    F = vt[8].reshape(3, 3)
    # enforce rank 2
    u, s, v = jnp.linalg.svd(F)
    return (u * s.at[2].set(0.0)[None]) @ v


def _solve_h(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """4-point DLT (we feed 8 points for stability): H [3,3], x2 ~ H x1."""
    x1, y1 = uv1[:, 0], uv1[:, 1]
    x2, y2 = uv2[:, 0], uv2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], 1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], 1)
    A = jnp.concatenate([r1, r2], 0)
    _, _, vt = jnp.linalg.svd(A)
    return vt[8].reshape(3, 3)


def _refit_f(uv1n, uv2n, w):
    """Weighted least-squares 8-point refit over all inliers."""
    x1, y1 = uv1n[:, 0], uv1n[:, 1]
    x2, y2 = uv2n[:, 0], uv2n[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1
    ) * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    F = vt[8].reshape(3, 3)
    u, s, v = jnp.linalg.svd(F)
    return (u * s.at[2].set(0.0)[None]) @ v


def _refit_h(uv1n, uv2n, w):
    x1, y1 = uv1n[:, 0], uv1n[:, 1]
    x2, y2 = uv2n[:, 0], uv2n[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], 1) * w[:, None]
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], 1) * w[:, None]
    A = jnp.concatenate([r1, r2], 0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    return vt[8].reshape(3, 3)


def _score_f(F, uv1, uv2, valid, sigma2=1.0):
    """Symmetric epipolar-distance score (Initializer::CheckFundamental)."""
    ones = jnp.ones((uv1.shape[0], 1), uv1.dtype)
    p1 = jnp.concatenate([uv1, ones], 1)
    p2 = jnp.concatenate([uv2, ones], 1)
    l2 = p1 @ F.T  # lines in image 2
    l1 = p2 @ F    # lines in image 1
    d2 = (jnp.sum(l2 * p2, 1) ** 2) / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = (jnp.sum(l1 * p1, 1) ** 2) / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    c1 = d1 / sigma2
    c2 = d2 / sigma2
    in1 = c1 < CHI2_F
    in2 = c2 < CHI2_F
    score = jnp.where(in1 & valid, TH_SCORE - c1, 0.0) + jnp.where(
        in2 & valid, TH_SCORE - c2, 0.0
    )
    return score.sum(), in1 & in2 & valid


def _score_h(H, uv1, uv2, valid, sigma2=1.0):
    Hinv = jnp.linalg.inv(H)
    def transfer(M, src, dst):
        ones = jnp.ones((src.shape[0], 1), src.dtype)
        p = jnp.concatenate([src, ones], 1) @ M.T
        z = jnp.where(jnp.abs(p[:, 2]) > 1e-9, p[:, 2], 1e-9)
        d = p[:, :2] / z[:, None] - dst
        return jnp.sum(d * d, 1)
    c1 = transfer(Hinv, uv2, uv1) / sigma2
    c2 = transfer(H, uv1, uv2) / sigma2
    in1 = c1 < CHI2_H
    in2 = c2 < CHI2_H
    score = jnp.where(in1 & valid, TH_SCORE - c1, 0.0) + jnp.where(
        in2 & valid, TH_SCORE - c2, 0.0
    )
    return score.sum(), in1 & in2 & valid


def _decompose_e(E: jnp.ndarray):
    """E -> 4 candidate (R, t) (Initializer::DecomposeE)."""
    u, _, vt = jnp.linalg.svd(E)
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _decompose_h(H: jnp.ndarray, K: jnp.ndarray):
    """H -> 8 candidate (R, t) via Faugeras SVD decomposition
    (Initializer::ReconstructH)."""
    A = jnp.linalg.inv(K) @ H @ K
    U, s, Vt = jnp.linalg.svd(A)
    d1, d2, d3 = s[0], s[1], s[2]
    sdet = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    eps = 1e-9
    # d' = d2 case
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3
    # case d' > 0
    sin_t = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3) * d2, eps
    )
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    stheta = jnp.array([1.0, -1.0, -1.0, 1.0]) * sin_t
    Rs, ts = [], []
    for i in range(4):
        Rp = jnp.array(
            [[cos_t, 0.0, -stheta[i]], [0.0, 1.0, 0.0], [stheta[i], 0.0, cos_t]]
        )
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        Rs.append(sdet * U @ Rp @ Vt)
        ts.append((U @ tp))
    # case d' < 0
    sin_p = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 - d3) * d2, eps
    )
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    sphi = jnp.array([1.0, -1.0, -1.0, 1.0]) * sin_p
    for i in range(4):
        Rp = jnp.array(
            [[cos_p, 0.0, sphi[i]], [0.0, -1.0, 0.0], [sphi[i], 0.0, -cos_p]]
        )
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        Rs.append(sdet * U @ Rp @ Vt)
        ts.append((U @ tp))
    R = jnp.stack(Rs)
    t = jnp.stack(ts)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=1, keepdims=True), 1e-12)
    return R, t


class Reconstruction(NamedTuple):
    success: jnp.ndarray   # bool scalar
    R21: jnp.ndarray       # [3,3]
    t21: jnp.ndarray       # [3] (unit norm)
    pts3d: jnp.ndarray     # [N,3] in view-1 frame
    inliers: jnp.ndarray   # [N] bool triangulated-good mask
    used_h: jnp.ndarray    # bool scalar (model choice)


def _check_rt(R, t, uv1, uv2, valid, K, sigma2=1.0):
    """Triangulate under (R,t) and count good points
    (Initializer::CheckRT): positive depth both views, reproj < 4 sigma^2,
    parallax below ~1deg excluded."""
    T1 = jnp.eye(4, dtype=R.dtype)
    T2 = jnp.eye(4, dtype=R.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
    P1 = K @ T1[:3]
    P2 = K @ T2[:3]
    pts = tri.triangulate(P1, P2, uv1, uv2)
    finite = jnp.isfinite(pts).all(axis=1)
    z1 = tri.depths(T1, pts)
    z2 = tri.depths(T2, pts)
    e1 = tri.reprojection_error2(P1, pts, uv1)
    e2 = tri.reprojection_error2(P2, pts, uv2)
    c1 = jnp.zeros(3, R.dtype)
    c2 = -R.T @ t
    cosp = tri.parallax_cos(c1, c2, pts)
    good = (
        valid & finite & (z1 > 0) & (z2 > 0)
        & (e1 < 4.0 * sigma2) & (e2 < 4.0 * sigma2)
        & (cosp < 0.99998)  # > ~0.36deg parallax
    )
    return good, pts


import functools


@functools.partial(jax.jit, static_argnames=("sigma2", "min_triangulated"))
def reconstruct(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    key: jax.Array,
    sigma2: float = 1.0,
    min_triangulated: int = 50,
) -> Reconstruction:
    """Full two-view bootstrap on [N,2] matched (distorted-corrected)
    pixel coordinates."""
    n = uv1.shape[0]
    count = jnp.maximum(valid.sum(), 8)
    # map random draws onto indices of valid entries (compacted order)
    order = jnp.argsort(~valid)  # valid first
    draws = jax.random.randint(key, (N_HYPOTHESES, 8), 0, count)
    sets = order[draws]  # [H,8]

    n1, T1n = _normalize(uv1, valid)
    n2, T2n = _normalize(uv2, valid)

    f_batch = jax.vmap(lambda s: _solve_f(n1[s], n2[s]))(sets)
    h_batch = jax.vmap(lambda s: _solve_h(n1[s], n2[s]))(sets)
    # denormalize: F = T2' Fn T1 ; H = T2^-1 Hn T1
    F_batch = jnp.einsum("ji,hjk,kl->hil", T2n, f_batch, T1n)
    H_batch = jnp.einsum("ij,hjk,kl->hil", jnp.linalg.inv(T2n), h_batch, T1n)

    f_scores, f_in = jax.vmap(lambda F: _score_f(F, uv1, uv2, valid, sigma2))(F_batch)
    h_scores, h_in = jax.vmap(lambda H: _score_h(H, uv1, uv2, valid, sigma2))(H_batch)
    fi = jnp.argmax(f_scores)
    hi = jnp.argmax(h_scores)

    # least-squares refit on the winning inlier sets, then rescore
    F_fit = jnp.einsum(
        "ji,jk,kl->il", T2n, _refit_f(n1, n2, f_in[fi].astype(n1.dtype)), T1n
    )
    H_fit = jnp.einsum(
        "ij,jk,kl->il",
        jnp.linalg.inv(T2n), _refit_h(n1, n2, h_in[hi].astype(n1.dtype)), T1n,
    )
    SF, f_inl = _score_f(F_fit, uv1, uv2, valid, sigma2)
    SH, h_inl = _score_h(H_fit, uv1, uv2, valid, sigma2)
    f_in = f_in.at[fi].set(f_inl)
    h_in = h_in.at[hi].set(h_inl)
    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40  # Initializer.cc RH ratio

    # candidate motions from both models; evaluate all 12, pick by vote
    E = K.T @ F_fit @ K
    Re, te = _decompose_e(E)
    Rh, th = _decompose_h(H_fit, K)
    R_all = jnp.concatenate([Re, Rh], 0)   # [12,3,3]
    t_all = jnp.concatenate([te, th], 0)
    model_in = jnp.where(use_h, h_in[hi], f_in[fi])
    is_h_cand = jnp.concatenate(
        [jnp.zeros(4, bool), jnp.ones(8, bool)], 0
    )
    allowed = jnp.where(use_h, is_h_cand, ~is_h_cand)

    goods, ptss = jax.vmap(
        lambda R, t: _check_rt(R, t, uv1, uv2, model_in, K, sigma2)
    )(R_all, t_all)
    ngood = jnp.where(allowed, goods.sum(1), -1)
    best = jnp.argmax(ngood)
    n_best = ngood[best]
    # winner must dominate: no runner-up with >70% of its support
    second = jnp.sort(jnp.where(allowed, goods.sum(1), -1))[-2]
    nin = jnp.maximum(model_in.sum(), 1)
    success = (
        (n_best >= min_triangulated)
        & (n_best.astype(jnp.float32) > 0.75 * nin.astype(jnp.float32))
        & (second.astype(jnp.float32) < 0.8 * n_best.astype(jnp.float32))
    )
    return Reconstruction(
        success=success,
        R21=R_all[best],
        t21=t_all[best],
        pts3d=ptss[best],
        inliers=goods[best],
        used_h=use_h,
    )
