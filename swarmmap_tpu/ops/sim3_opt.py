"""Sim(3) relative-pose refinement (device).

Reference spec: Optimizer::OptimizeSim3
(/root/reference/code/src/Optimizer.cc:998+) — g2o LM over one Sim3 vertex
with forward/backward reprojection edge pairs, Huber delta sqrt(10),
outlier removal between two 5-iteration rounds.

TPU formulation: batched residuals with autodiff Jacobians over the 7-dim
tangent (jacfwd of the full residual vector — 7 cheap forward passes),
fixed LM schedule under jit.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie

CHI2_SIM3 = 9.210  # 2-dof chi2 at 99% (g2o th2 = 10 is close; reference uses 10)
HUBER = jnp.sqrt(10.0)


def _project(Km, pc):
    z = jnp.maximum(pc[..., 2], 1e-9)
    return jnp.stack(
        [
            Km[0, 0] * pc[..., 0] / z + Km[0, 2],
            Km[1, 1] * pc[..., 1] / z + Km[1, 2],
        ],
        -1,
    )


class Sim3OptResult(NamedTuple):
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def optimize_sim3(
    s0: jnp.ndarray, R0: jnp.ndarray, t0: jnp.ndarray,
    pc1: jnp.ndarray, pc2: jnp.ndarray,
    uv1: jnp.ndarray, uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray, inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    K1: jnp.ndarray, K2: jnp.ndarray,
    fix_scale: bool = False,
    iters: int = 10,
    chi2_th: float = 10.0,
) -> Sim3OptResult:
    """Refine S12 so that  project(K1, S12 pc2) = uv1  and
    project(K2, S12^-1 pc1) = uv2."""

    xi0 = lie.sim3_log(R0, t0, s0)

    def residuals_rts(R, t, s):
        p2in1 = s * (pc2 @ R.T) + t
        sinv = 1.0 / jnp.maximum(s, 1e-12)
        p1in2 = sinv * ((pc1 - t) @ R)
        e1 = _project(K1, p2in1) - uv1
        e2 = _project(K2, p1in2) - uv2
        return e1, e2

    def residuals(xi):
        return residuals_rts(*lie.sim3_exp(xi))

    def weights(e1, e2, active):
        c1 = jnp.sum(e1 * e1, 1) * inv_sigma2_1
        c2 = jnp.sum(e2 * e2, 1) * inv_sigma2_2
        h1 = jnp.where(jnp.sqrt(c1 + 1e-12) <= HUBER, 1.0, HUBER / jnp.sqrt(c1 + 1e-12))
        h2 = jnp.where(jnp.sqrt(c2 + 1e-12) <= HUBER, 1.0, HUBER / jnp.sqrt(c2 + 1e-12))
        return (inv_sigma2_1 * h1 * active, inv_sigma2_2 * h2 * active)

    def cost(xi, active):
        e1, e2 = residuals(xi)
        def rho(c):
            e = jnp.sqrt(c + 1e-12)
            return jnp.where(e <= HUBER, c, 2 * HUBER * e - HUBER**2)
        c1 = jnp.sum(e1 * e1, 1) * inv_sigma2_1
        c2 = jnp.sum(e2 * e2, 1) * inv_sigma2_2
        return jnp.sum((rho(c1) + rho(c2)) * active)

    def lm(xi, active, n_it):
        def body(_, carry):
            xi, lam = carry
            e1, e2 = residuals(xi)
            Rc, tc, sc = lie.sim3_exp(xi)

            def res_of_delta(d):
                dR, dt, ds = lie.sim3_exp(d)
                return jnp.concatenate(
                    residuals_rts(*lie.sim3_mul(dR, dt, ds, Rc, tc, sc)), axis=0
                )

            Jf = jax.jacfwd(res_of_delta)(jnp.zeros(7, xi.dtype))  # [2N,2,7]
            w1, w2 = weights(e1, e2, active)
            r = jnp.concatenate([e1, e2], 0)            # [2N,2]
            w = jnp.concatenate([w1, w2], 0)            # [2N]
            H = jnp.einsum("nik,n,nil->kl", Jf, w, Jf)
            b = -jnp.einsum("nik,n,ni->k", Jf, w, r)
            if fix_scale:
                H = H.at[6, 6].add(1e6)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(7, dtype=H.dtype)
            dx = jnp.linalg.solve(Hd, b)
            dx = jnp.where(fix_scale, dx.at[6].set(0.0), dx)
            xi_new = lie.sim3_log(*lie.sim3_mul(*lie.sim3_exp(dx), *lie.sim3_exp(xi)))
            ok = cost(xi_new, active) < cost(xi, active)
            xi = jnp.where(ok, xi_new, xi)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-8, 1e8)
            return xi, lam

        xi, _ = jax.lax.fori_loop(0, n_it, body, (xi, jnp.asarray(1e-3, xi.dtype)))
        return xi

    def classify(xi):
        e1, e2 = residuals(xi)
        c1 = jnp.sum(e1 * e1, 1) * inv_sigma2_1
        c2 = jnp.sum(e2 * e2, 1) * inv_sigma2_2
        return valid & (c1 < chi2_th) & (c2 < chi2_th)

    active = valid.astype(xi0.dtype)
    xi = lm(xi0, active, iters // 2)
    inl = classify(xi)
    xi = lm(xi, inl.astype(xi0.dtype), iters)
    inl = classify(xi)
    R, t, s = lie.sim3_exp(xi)
    return Sim3OptResult(s=s, R=R, t=t, inliers=inl, n_inliers=inl.sum())


@functools.partial(jax.jit, static_argnames=("fix_scale", "iters"))
def optimize_sim3_points(
    s0: jnp.ndarray, R0: jnp.ndarray, t0: jnp.ndarray,
    p1: jnp.ndarray, p2: jnp.ndarray,
    valid: jnp.ndarray,
    fix_scale: bool = False,
    iters: int = 10,
    chi2_th: float = 10.0,
) -> Sim3OptResult:
    """The EdgeSim3RelativeXYZ analogue (reference:
    include/g2o/EdgeSim3RelativeXYZ.h + Optimizer::OptimizeSim3ByKeyFrame
    / OptimizeSim3ByMapPoint, Optimizer.cc:1450-1811): refine a Sim3 Twl
    so that p1 ~ Twl.map(p2) over matched 3D point pairs — the edge's
    residual is obs - v_sim3.map(p), Huber(sqrt(th2)), LM, one chi2
    pruning pass between two optimization rounds.

    Like the reference's ByMapPoint variant (whose production call site
    is commented out, MapManager.cc:142-144), this is the cross-map
    Twl refinement primitive; MapManager.fuse uses it to polish the
    group transform from the duplicate pairs it discovers."""
    xi0 = lie.sim3_log(R0, t0, s0)

    def residuals_rts(R, t, s):
        return p1 - (s * (p2 @ R.T) + t)

    def residuals(xi):
        return residuals_rts(*lie.sim3_exp(xi))

    huber = jnp.sqrt(jnp.asarray(chi2_th, p1.dtype))

    def cost(xi, active):
        e = residuals(xi)
        c = jnp.sum(e * e, 1)
        r = jnp.sqrt(c + 1e-12)
        rho = jnp.where(r <= huber, c, 2 * huber * r - huber**2)
        return jnp.sum(rho * active)

    def lm(xi, active, n_it):
        def body(_, carry):
            xi, lam = carry
            e = residuals(xi)
            Rc, tc, sc = lie.sim3_exp(xi)

            def res_of_delta(d):
                dR, dt, ds = lie.sim3_exp(d)
                return residuals_rts(*lie.sim3_mul(dR, dt, ds, Rc, tc, sc))

            Jf = jax.jacfwd(res_of_delta)(jnp.zeros(7, xi.dtype))  # [N,3,7]
            c = jnp.sum(e * e, 1)
            r = jnp.sqrt(c + 1e-12)
            w = jnp.where(r <= huber, 1.0, huber / r) * active
            H = jnp.einsum("nik,n,nil->kl", Jf, w, Jf)
            b = -jnp.einsum("nik,n,ni->k", Jf, w, e)
            if fix_scale:
                H = H.at[6, 6].add(1e6)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(7, dtype=H.dtype)
            dx = jnp.linalg.solve(Hd, b)
            xi_new = lie.sim3_log(*lie.sim3_mul(*lie.sim3_exp(dx), *lie.sim3_exp(xi)))
            ok = cost(xi_new, active) < cost(xi, active)
            xi = jnp.where(ok, xi_new, xi)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-8, 1e8)
            return xi, lam

        xi, _ = jax.lax.fori_loop(0, n_it, body, (xi, jnp.asarray(1e-3, xi.dtype)))
        return xi

    def classify(xi):
        e = residuals(xi)
        return valid & (jnp.sum(e * e, 1) < chi2_th)

    # reference schedule: optimize(5) -> chi2 prune -> optimize(5 or 10)
    xi = lm(xi0, valid.astype(xi0.dtype), iters // 2)
    inl = classify(xi)
    xi = lm(xi, inl.astype(xi0.dtype), iters)
    inl = classify(xi)
    R, t, s = lie.sim3_exp(xi)
    return Sim3OptResult(s=s, R=R, t=t, inliers=inl, n_inliers=inl.sum())
