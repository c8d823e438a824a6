"""Motion-only pose optimization (device).

Reference spec: Optimizer::PoseOptimization
(/root/reference/code/src/Optimizer.cc:239) — g2o Levenberg-Marquardt over
one SE(3) vertex with monocular reprojection edges, Huber kernel
delta = sqrt(5.991), 4 rounds x 10 iterations with chi-square outlier
re-classification between rounds.

TPU formulation: fully batched residuals/Jacobians, closed-form 6x6
normal-equation solves, fixed iteration counts under jit.  Outlier gating
is a mask update — no edge removal.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie

CHI2_MONO = 5.991
HUBER_DELTA = jnp.sqrt(5.991)


def _inv3(M):
    """Closed-form 3x3 inverse (adjugate) — pure elementwise ops."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    adj = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([D, E, F], -1),
        jnp.stack([G, H, I], -1),
    ], -2)
    return adj / det[..., None, None]


def solve6(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a 6x6 SPD system via 3x3 block elimination with closed-form
    inverses.  jnp.linalg.solve lowers to a sequential LU While-loop on
    TPU (~hundreds of micro-ops); this is ~10 fused tensor ops, which
    matters because LM runs dozens of solves back-to-back."""
    A = H[..., :3, :3]
    B = H[..., :3, 3:]
    C = H[..., 3:, 3:]
    b1 = b[..., :3]
    b2 = b[..., 3:]
    Ainv = _inv3(A)
    BtAinv = jnp.swapaxes(B, -1, -2) @ Ainv
    S = C - BtAinv @ B
    Sinv = _inv3(S)
    rhs2 = b2 - (BtAinv @ b1[..., None])[..., 0]
    x2 = (Sinv @ rhs2[..., None])[..., 0]
    x1 = (Ainv @ (b1 - (B @ x2[..., None])[..., 0])[..., None])[..., 0]
    return jnp.concatenate([x1, x2], -1)


def _residuals_jac(Tcw, K, pts_w, uv):
    """Residuals [N,2] and Jacobians [N,2,6] wrt left-multiplied se3 update
    (omega, upsilon)."""
    pc = (Tcw[:3, :3] @ pts_w.T).T + Tcw[:3, 3]
    x, y = pc[:, 0], pc[:, 1]
    z = jnp.maximum(pc[:, 2], 1e-6)
    fx, fy = K[0, 0], K[1, 1]
    u = fx * x / z + K[0, 2]
    v = fy * y / z + K[1, 2]
    r = jnp.stack([u, v], 1) - uv
    zinv = 1.0 / z
    zinv2 = zinv * zinv
    # d(uv)/d(pc)
    j00 = fx * zinv
    j02 = -fx * x * zinv2
    j11 = fy * zinv
    j12 = -fy * y * zinv2
    zero = jnp.zeros_like(z)
    Juv = jnp.stack(
        [
            jnp.stack([j00, zero, j02], 1),
            jnp.stack([zero, j11, j12], 1),
        ],
        1,
    )  # [N,2,3]
    # d(pc)/d(xi): [-hat(pc) | I]
    Jp = jnp.concatenate(
        [-lie.hat(pc), jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))],
        axis=2,
    )  # [N,3,6]
    J = Juv @ Jp  # [N,2,6]
    return r, J, pc[:, 2]


class PoseOptResult(NamedTuple):
    Tcw: jnp.ndarray       # [4,4]
    inliers: jnp.ndarray   # [N] bool
    chi2: jnp.ndarray      # [N] f32 (weighted squared error)


import functools


@functools.partial(jax.jit, static_argnames=("rounds", "iters", "chi2_th"))
def pose_optimize(
    Tcw0: jnp.ndarray,
    K: jnp.ndarray,
    pts_w: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    rounds: int = 4,
    iters: int = 10,
    chi2_th: float = CHI2_MONO,
    step_tol: float = 1e-6,
) -> PoseOptResult:
    """Optimize one camera pose against fixed 3D points.

    Each round is a while_loop capped at `iters` that exits early once an
    accepted step's norm drops below `step_tol` (g2o likewise terminates
    on vanishing increments) — on motion-model-grade initial guesses this
    typically halves the sequential LM chain, the dominant latency of the
    fused tracking step."""
    n = pts_w.shape[0]

    def lm_round(Tcw, active):
        def cond(carry):
            _T, _lam, _c, i, conv = carry
            return (i < iters) & jnp.logical_not(conv)

        def body(carry):
            T, lam, last_cost, i, _conv = carry
            r, J, _z = _residuals_jac(T, K, pts_w, uv)
            w = inv_sigma2 * active.astype(r.dtype)
            # Huber IRLS weights on the sigma-normalized error norm
            en = jnp.sqrt(jnp.sum(r * r, 1) * inv_sigma2 + 1e-12)
            hub = jnp.where(en <= HUBER_DELTA, 1.0, HUBER_DELTA / en)
            wh = w * hub
            H = jnp.einsum("nik,n,nil->kl", J, wh, J)
            b = -jnp.einsum("nik,n,ni->k", J, wh, r)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=H.dtype)
            dx = solve6(Hd, b)
            T_new = lie.se3_exp(dx) @ T
            r_new, _, _ = _residuals_jac(T_new, K, pts_w, uv)
            def cost(rr):
                e = jnp.sqrt(jnp.sum(rr * rr, 1) * inv_sigma2 + 1e-12)
                rho = jnp.where(
                    e <= HUBER_DELTA, e * e, 2 * HUBER_DELTA * e - HUBER_DELTA**2
                )
                return jnp.sum(rho * active)
            c_old = cost(r)
            c_new = cost(r_new)
            improved = c_new < c_old
            T = jnp.where(improved, T_new, T)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-8, 1e6)
            step = jnp.sqrt(jnp.sum(dx * dx))
            conv = (improved & (step < step_tol)) | (
                jnp.logical_not(improved) & (lam >= 1e6))
            return T, lam, jnp.where(improved, c_new, c_old), i + 1, conv

        T, _, _, _, _ = jax.lax.while_loop(
            cond, body,
            (Tcw, jnp.asarray(1e-3, Tcw.dtype),
             jnp.asarray(jnp.inf, Tcw.dtype), jnp.int32(0), jnp.bool_(False)),
        )
        return T

    active = valid
    Tcw = Tcw0
    for _ in range(rounds):
        Tcw = lm_round(Tcw, active)
        r, _, z = _residuals_jac(Tcw, K, pts_w, uv)
        chi2 = jnp.sum(r * r, 1) * inv_sigma2
        active = valid & (chi2 <= chi2_th) & (z > 0)
    r, _, z = _residuals_jac(Tcw, K, pts_w, uv)
    chi2 = jnp.sum(r * r, 1) * inv_sigma2
    inl = valid & (chi2 <= chi2_th) & (z > 0)
    return PoseOptResult(Tcw=Tcw, inliers=inl, chi2=chi2)


def pose_optimize_auto(
    Tcw0, K, pts_w, uv, inv_sigma2, valid,
    rounds: int = 4, iters: int = 10, chi2_th: float = CHI2_MONO,
) -> PoseOptResult:
    """Backend dispatcher shared by the fused and staged paths: on TPU
    the whole LM optimization runs as ONE Pallas kernel
    (ops/pallas_pose.py) — the XLA lowering pays ~47 µs of launch
    latency per sequential LM iteration, so the staged path's 4x10
    schedule costs ~1.9 ms of pure latency that the kernel collapses to
    ~10 µs.  Elsewhere (CPU tests, interpret) the XLA formulation.
    Opt out with SWARMMAP_NO_PALLAS_POSE=1."""
    import os

    if (jax.default_backend() == "tpu"
            and not os.environ.get("SWARMMAP_NO_PALLAS_POSE")):
        from . import pallas_pose

        return pallas_pose.pose_optimize_pallas(
            Tcw0, K, pts_w, uv, inv_sigma2, valid,
            rounds=rounds, iters=iters, chi2_th=chi2_th,
        )
    return pose_optimize(
        Tcw0, K, pts_w, uv, inv_sigma2, valid,
        rounds=rounds, iters=iters, chi2_th=chi2_th,
    )
