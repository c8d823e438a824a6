"""Essential-graph Sim(3) pose-graph optimization (device).

Reference spec: Optimizer::OptimizeEssentialGraph
(/root/reference/code/src/Optimizer.cc:743+) — g2o over one Sim3 vertex
per keyframe with loop edges, spanning-tree edges and strong-covisibility
edges; identity information matrices; the loop keyframe fixed.

TPU formulation: the whole graph is solved as batched Gauss-Newton —
per-edge 7x14 Jacobians come from vmapped forward-mode autodiff of the
edge residual  e = log(S_ji * S_iw * S_wj),  scatter-assembled into one
dense [7N,7N] system (pose graphs here are a few hundred keyframes, well
inside dense-Cholesky territory on the MXU).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie


class Sim3Nodes(NamedTuple):
    R: jnp.ndarray  # [N,3,3] world->node (Siw convention, like the reference)
    t: jnp.ndarray  # [N,3]
    s: jnp.ndarray  # [N]


def _edge_residual(xi_i, xi_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
    """e = log( S_ji * (exp(xi_i) S_iw) * (exp(xi_j) S_jw)^-1 ).

    Left-perturbations xi on each node; measurement S_ji = (Rm, tm, sm)."""
    dRi, dti, dsi = lie.sim3_exp(xi_i)
    dRj, dtj, dsj = lie.sim3_exp(xi_j)
    Ri2, ti2, si2 = lie.sim3_mul(dRi, dti, dsi, Ri, ti, si)
    Rj2, tj2, sj2 = lie.sim3_mul(dRj, dtj, dsj, Rj, tj, sj)
    Rji, tji, sji = lie.sim3_mul(Rm, tm, sm, Ri2, ti2, si2)
    Rwj, twj, swj = lie.sim3_inv(Rj2, tj2, sj2)
    Re, te, se = lie.sim3_mul(Rji, tji, sji, Rwj, twj, swj)
    return lie.sim3_log(Re, te, se)


def optimize_pose_graph(
    nodes: Sim3Nodes,
    edge_i: jnp.ndarray,        # [E] i32
    edge_j: jnp.ndarray,        # [E] i32
    meas_R: jnp.ndarray,        # [E,3,3]  S_ji measurements
    meas_t: jnp.ndarray,        # [E,3]
    meas_s: jnp.ndarray,        # [E]
    edge_valid: jnp.ndarray,    # [E] bool
    node_fixed: jnp.ndarray,    # [N] bool
    node_valid: jnp.ndarray,    # [N] bool
    iters: int = 20,
    fix_scale: bool = False,
) -> Sim3Nodes:
    n = nodes.R.shape[0]

    def gn_step(carry, _):
        (R, t, s), lam = carry

        def edge_r_and_j(i, j, Rm, tm, sm):
            def f(x):
                return _edge_residual(
                    x[:7], x[7:], R[i], t[i], s[i], R[j], t[j], s[j], Rm, tm, sm
                )
            z = jnp.zeros(14, R.dtype)
            return f(z), jax.jacfwd(f)(z)

        r, J = jax.vmap(edge_r_and_j)(edge_i, edge_j, meas_R, meas_t, meas_s)
        w = edge_valid.astype(R.dtype)
        Ji = J[:, :, :7] * w[:, None, None]
        Jj = J[:, :, 7:] * w[:, None, None]
        rw = r * w[:, None]
        # assemble dense H [N,7,N,7] and b [N,7]
        H = jnp.zeros((n, 7, n, 7), R.dtype)
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji)
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj)
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj)
        H = H.at[edge_i, :, edge_i, :].add(Hii)
        H = H.at[edge_j, :, edge_j, :].add(Hjj)
        H = H.at[edge_i, :, edge_j, :].add(Hij)
        H = H.at[edge_j, :, edge_i, :].add(jnp.swapaxes(Hij, 1, 2))
        b = jnp.zeros((n, 7), R.dtype)
        b = b.at[edge_i].add(-jnp.einsum("eki,ek->ei", Ji, rw))
        b = b.at[edge_j].add(-jnp.einsum("eki,ek->ei", Jj, rw))
        # anchor fixed / invalid nodes
        anchored = node_fixed | ~node_valid
        eye7 = jnp.eye(7, dtype=R.dtype)
        diag_idx = jnp.arange(n)
        H = H.at[diag_idx, :, diag_idx, :].add(
            jnp.where(anchored[:, None, None], 1e8 * eye7[None], lam * eye7[None])
        )
        if fix_scale:
            # heavily damp all scale dofs
            H = H.at[diag_idx, 6, diag_idx, 6].add(1e8)
        dx = jnp.linalg.solve(H.reshape(7 * n, 7 * n), b.reshape(-1)).reshape(n, 7)
        dx = dx * (~anchored[:, None])
        if fix_scale:
            dx = dx.at[:, 6].set(0.0)
        dR, dt, ds = jax.vmap(lie.sim3_exp)(dx)
        R2, t2, s2 = jax.vmap(lie.sim3_mul)(dR, dt, ds, R, t, s)

        def total_cost(Rc, tc, sc):
            rr = jax.vmap(
                lambda i, j, Rm, tm, sm: _edge_residual(
                    jnp.zeros(7, R.dtype), jnp.zeros(7, R.dtype),
                    Rc[i], tc[i], sc[i], Rc[j], tc[j], sc[j], Rm, tm, sm,
                )
            )(edge_i, edge_j, meas_R, meas_t, meas_s)
            return jnp.sum(jnp.sum(rr * rr, 1) * w)

        ok = total_cost(R2, t2, s2) < total_cost(R, t, s)
        R = jnp.where(ok, R2, R)
        t = jnp.where(ok, t2, t)
        s = jnp.where(ok, s2, s)
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 8.0), 1e-10, 1e6)
        return ((R, t, s), lam), None

    ((R, t, s), _), _ = jax.lax.scan(
        gn_step,
        ((nodes.R, nodes.t, nodes.s), jnp.asarray(1e-6, nodes.R.dtype)),
        None,
        length=iters,
    )
    return Sim3Nodes(R=R, t=t, s=s)
