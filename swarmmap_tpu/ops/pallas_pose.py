"""Motion-only LM pose optimization as ONE Pallas TPU kernel.

Reference counterpart: Optimizer::PoseOptimization (Optimizer.cc:239).
The XLA formulation (ops/pose_opt.py) is mathematically identical but
latency-bound: each of the rounds×iters sequential LM iterations lowers
to ~10 small kernels (~47 µs/iteration measured on v5e), so the 2×8
fused-path schedule costs ~0.7 ms of pure launch latency.  This kernel
keeps the ENTIRE optimization — all rounds, all iterations, Huber IRLS,
the λ accept/reject schedule, and the chi² re-gating between rounds —
inside one Pallas program: the point cloud lives in VMEM as [3,N]/[1,N]
lane-major vectors, the pose is 12 registers, and the 6×6 normal-equation
solve is closed-form scalar block elimination.

Semantics match ops.pose_opt.pose_optimize with step_tol=0 (fixed
iteration counts; data-dependent early exit would force an in-kernel
while_loop for ~µs-level savings).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import math

from .pose_opt import CHI2_MONO, PoseOptResult

HUBER = math.sqrt(CHI2_MONO)


def _inv3_rows(M):
    """Closed-form inverse of a 3x3 given as nested scalar lists."""
    (a, b, c), (d, e, f), (g, h, i) = M
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d  # noqa: E741
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    return [[A / det, B / det, C / det],
            [D / det, E / det, F / det],
            [G / det, H / det, I / det]]


def _mat3_mul(A, B):
    return [[sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]


def _mat3_vec(A, v):
    return [sum(A[i][k] * v[k] for k in range(3)) for i in range(3)]


def _solve6(H, b):
    """6x6 SPD solve via 3x3 block elimination on scalars."""
    A = [row[:3] for row in H[:3]]
    B = [row[3:] for row in H[:3]]
    C = [row[3:] for row in H[3:]]
    b1, b2 = b[:3], b[3:]
    Ainv = _inv3_rows(A)
    Bt = [[B[j][i] for j in range(3)] for i in range(3)]
    BtAinv = _mat3_mul(Bt, Ainv)
    S = [[C[i][j] - sum(BtAinv[i][k] * B[k][j] for k in range(3))
          for j in range(3)] for i in range(3)]
    Sinv = _inv3_rows(S)
    rhs2 = [b2[i] - sum(BtAinv[i][k] * b1[k] for k in range(3))
            for i in range(3)]
    x2 = _mat3_vec(Sinv, rhs2)
    rhs1 = [b1[i] - sum(B[i][k] * x2[k] for k in range(3)) for i in range(3)]
    x1 = _mat3_vec(Ainv, rhs1)
    return x1 + x2


def _so3_exp_rows(w0, w1, w2):
    """Rodrigues rotation from scalar axis-angle."""
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    th = jnp.sqrt(th2 + 1e-24)
    small = th < 1e-5
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    Bc = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    # R = I + A*hat(w) + B*hat(w)^2
    return [
        [1.0 - Bc * (w1 * w1 + w2 * w2), -A * w2 + Bc * w0 * w1, A * w1 + Bc * w0 * w2],
        [A * w2 + Bc * w0 * w1, 1.0 - Bc * (w0 * w0 + w2 * w2), -A * w0 + Bc * w1 * w2],
        [-A * w1 + Bc * w0 * w2, A * w0 + Bc * w1 * w2, 1.0 - Bc * (w0 * w0 + w1 * w1)],
    ]


def _se3_exp_compose(dx, R, t):
    """Left-multiply exp(dx) onto (R, t) — matches lie.se3_exp(dx) @ T.

    dx = (omega, upsilon); translation part uses the exact V(omega) as
    lie.se3_exp does."""
    w0, w1, w2 = dx[0], dx[1], dx[2]
    u = dx[3:]
    Re = _so3_exp_rows(w0, w1, w2)
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    th = jnp.sqrt(th2 + 1e-24)
    small = th < 1e-5
    Bc = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    Cc = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (th - jnp.sin(th)) / (th2 * th))
    # V = I + B*hat(w) + C*hat(w)^2
    V = [
        [1.0 - Cc * (w1 * w1 + w2 * w2), -Bc * w2 + Cc * w0 * w1, Bc * w1 + Cc * w0 * w2],
        [Bc * w2 + Cc * w0 * w1, 1.0 - Cc * (w0 * w0 + w2 * w2), -Bc * w0 + Cc * w1 * w2],
        [-Bc * w1 + Cc * w0 * w2, Bc * w0 + Cc * w1 * w2, 1.0 - Cc * (w0 * w0 + w1 * w1)],
    ]
    Vu = _mat3_vec(V, u)
    R_new = _mat3_mul(Re, R)
    t_new = [_mat3_vec(Re, t)[i] + Vu[i] for i in range(3)]
    return R_new, t_new


def _make_kernel(rounds: int, iters: int, chi2_th: float):
    def kernel(T_ref, K_ref, pts_ref, uv_ref, is2_ref, valid_ref,
               Tout_ref, inl_ref, chi2_ref):
        fx = K_ref[0, 0]
        fy = K_ref[0, 1]
        cx = K_ref[0, 2]
        cy = K_ref[0, 3]
        X = pts_ref[0, :]
        Y = pts_ref[1, :]
        Z = pts_ref[2, :]
        U = uv_ref[0, :]
        Vv = uv_ref[1, :]
        is2 = is2_ref[0, :]
        valid = valid_ref[0, :]

        def flatR(R, t):
            return jnp.stack([R[0][0], R[0][1], R[0][2],
                              R[1][0], R[1][1], R[1][2],
                              R[2][0], R[2][1], R[2][2],
                              t[0], t[1], t[2]])

        def unflat(s):
            R = [[s[0], s[1], s[2]], [s[3], s[4], s[5]], [s[6], s[7], s[8]]]
            t = [s[9], s[10], s[11]]
            return R, t

        def project(R, t):
            pcx = R[0][0] * X + R[0][1] * Y + R[0][2] * Z + t[0]
            pcy = R[1][0] * X + R[1][1] * Y + R[1][2] * Z + t[1]
            pcz = R[2][0] * X + R[2][1] * Y + R[2][2] * Z + t[2]
            z = jnp.maximum(pcz, 1e-6)
            ru = fx * pcx / z + cx - U
            rv = fy * pcy / z + cy - Vv
            return pcx, pcy, pcz, z, ru, rv

        def robust_cost(ru, rv, active):
            e = jnp.sqrt((ru * ru + rv * rv) * is2 + 1e-12)
            rho = jnp.where(e <= HUBER, e * e, 2 * HUBER * e - HUBER * HUBER)
            return jnp.sum(rho * active)

        def lm_iter(carry, active):
            s, lam = carry
            R, t = unflat(s)
            pcx, pcy, pcz, z, ru, rv = project(R, t)
            w = is2 * active
            en = jnp.sqrt((ru * ru + rv * rv) * is2 + 1e-12)
            hub = jnp.where(en <= HUBER, 1.0, HUBER / en)
            wh = w * hub
            zi = 1.0 / z
            zi2 = zi * zi
            a00 = fx * zi
            a02 = -fx * pcx * zi2
            a11 = fy * zi
            a12 = -fy * pcy * zi2
            # J columns wrt (omega, upsilon): d(pc)/dxi = [-hat(pc) | I],
            # -hat(pc) columns = (0,-pz,py), (pz,0,-px), (-py,px,0);
            # du = a00*dpcx + a02*dpcz ; dv = a11*dpcy + a12*dpcz
            zero = jnp.zeros_like(a00)
            Ju = [a02 * pcy,
                  a00 * pcz - a02 * pcx,
                  -a00 * pcy,
                  a00, zero, a02]
            Jv = [-a11 * pcz + a12 * pcy,
                  -a12 * pcx,
                  a11 * pcx,
                  zero, a11, a12]
            H = [[jnp.sum(wh * (Ju[i] * Ju[j] + Jv[i] * Jv[j]))
                  for j in range(6)] for i in range(6)]
            b = [-jnp.sum(wh * (Ju[i] * ru + Jv[i] * rv)) for i in range(6)]
            Hd = [[H[i][j] + jnp.where(i == j, lam * H[i][j] + 1e-9, 0.0)
                   for j in range(6)] for i in range(6)]
            dx = _solve6(Hd, b)
            R_new, t_new = _se3_exp_compose(dx, R, t)
            _, _, _, _, ru2, rv2 = project(R_new, t_new)
            c_old = robust_cost(ru, rv, active)
            c_new = robust_cost(ru2, rv2, active)
            improved = c_new < c_old
            s_new = jnp.where(improved, flatR(R_new, t_new), s)
            lam_new = jnp.clip(jnp.where(improved, lam * 0.5, lam * 4.0),
                               1e-8, 1e6)
            return (s_new, lam_new)

        R0 = [[T_ref[0, 0], T_ref[0, 1], T_ref[0, 2]],
              [T_ref[1, 0], T_ref[1, 1], T_ref[1, 2]],
              [T_ref[2, 0], T_ref[2, 1], T_ref[2, 2]]]
        t0 = [T_ref[0, 3], T_ref[1, 3], T_ref[2, 3]]
        s = flatR(R0, t0)
        active = valid
        for _ in range(rounds):
            lam = jnp.float32(1e-3)

            def body(_i, carry):
                return lm_iter(carry, active)

            s, _ = jax.lax.fori_loop(0, iters, body, (s, lam))
            R, t = unflat(s)
            _, _, pcz, _, ru, rv = project(R, t)
            chi2 = (ru * ru + rv * rv) * is2
            active = valid * ((chi2 <= chi2_th) & (pcz > 0)).astype(valid.dtype)
        R, t = unflat(s)
        _, _, pcz, _, ru, rv = project(R, t)
        chi2 = (ru * ru + rv * rv) * is2
        inl = valid * ((chi2 <= chi2_th) & (pcz > 0)).astype(valid.dtype)
        Tout_ref[0, 0] = s[0]
        Tout_ref[0, 1] = s[1]
        Tout_ref[0, 2] = s[2]
        Tout_ref[0, 3] = s[9]
        Tout_ref[1, 0] = s[3]
        Tout_ref[1, 1] = s[4]
        Tout_ref[1, 2] = s[5]
        Tout_ref[1, 3] = s[10]
        Tout_ref[2, 0] = s[6]
        Tout_ref[2, 1] = s[7]
        Tout_ref[2, 2] = s[8]
        Tout_ref[2, 3] = s[11]
        Tout_ref[3, 0] = 0.0
        Tout_ref[3, 1] = 0.0
        Tout_ref[3, 2] = 0.0
        Tout_ref[3, 3] = 1.0
        inl_ref[0, :] = inl
        chi2_ref[0, :] = chi2

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("rounds", "iters", "chi2_th", "interpret"),
)
def pose_optimize_pallas(
    Tcw0: jnp.ndarray,
    K: jnp.ndarray,
    pts_w: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    rounds: int = 2,
    iters: int = 8,
    chi2_th: float = CHI2_MONO,
    interpret: bool = False,
) -> PoseOptResult:
    """Drop-in for pose_opt.pose_optimize (step_tol=0) as one kernel."""
    n = pts_w.shape[0]
    ptsT = pts_w.astype(jnp.float32).T.reshape(3, n)
    uvT = uv.astype(jnp.float32).T.reshape(2, n)
    kvec = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]).reshape(1, 4)
    is2 = inv_sigma2.astype(jnp.float32).reshape(1, n)
    val = valid.astype(jnp.float32).reshape(1, n)
    Tout, inl, chi2 = pl.pallas_call(
        _make_kernel(rounds, iters, chi2_th),
        out_shape=(
            jax.ShapeDtypeStruct((4, 4), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # T0 (scalar reads)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # K
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pts
            pl.BlockSpec(memory_space=pltpu.VMEM),   # uv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # inv_sigma2
            pl.BlockSpec(memory_space=pltpu.VMEM),   # valid
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),  # 4x4 pose: scalar stores
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(Tcw0.astype(jnp.float32), kvec, ptsT, uvT, is2, val)
    return PoseOptResult(Tcw=Tout, inliers=inl[0] > 0.5, chi2=chi2[0])
