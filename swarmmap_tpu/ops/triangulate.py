"""Batched linear triangulation (device).

Reference spec: the SVD triangulation inside
LocalMapping::CreateNewMapPoints (/root/reference/code/src/LocalMapping.cc:190)
and Initializer::Triangulate — per-point 4x4 DLT.

TPU formulation: all points triangulated at once with a batched SVD.
"""
from __future__ import annotations

import jax.numpy as jnp


def projection_matrix(K: jnp.ndarray, Tcw: jnp.ndarray) -> jnp.ndarray:
    """3x4 projection P = K [R|t]."""
    return K @ Tcw[:3, :4]


def triangulate(
    P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray
) -> jnp.ndarray:
    """DLT: [N,2] pixel pairs -> [N,3] world points.

    A x = 0 with rows (u * P[2] - P[0]), (v * P[2] - P[1]) per view.
    """
    rows = [
        uv1[:, 0:1] * P1[2][None] - P1[0][None],
        uv1[:, 1:2] * P1[2][None] - P1[1][None],
        uv2[:, 0:1] * P2[2][None] - P2[0][None],
        uv2[:, 1:2] * P2[2][None] - P2[1][None],
    ]
    A = jnp.stack(rows, axis=1)  # [N,4,4]
    # null vector of A: smallest right singular vector
    _, _, vt = jnp.linalg.svd(A)
    x = vt[:, 3, :]
    w = x[:, 3]
    safe = jnp.where(jnp.abs(w) > 1e-10, w, 1e-10)
    return x[:, :3] / safe[:, None]


def reprojection_error2(
    P: jnp.ndarray, pts: jnp.ndarray, uv: jnp.ndarray
) -> jnp.ndarray:
    """Squared pixel reprojection error of [N,3] points under 3x4 P."""
    ph = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], 1)
    proj = ph @ P.T
    z = jnp.where(jnp.abs(proj[:, 2]) > 1e-9, proj[:, 2], 1e-9)
    d = proj[:, :2] / z[:, None] - uv
    return jnp.sum(d * d, axis=1)


def depths(Tcw: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    return (Tcw[:3, :3] @ pts.T).T[:, 2] + Tcw[2, 3]


def parallax_cos(c1: jnp.ndarray, c2: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Cosine of the ray angle between camera centers c1, c2 and points."""
    r1 = pts - c1[None]
    r2 = pts - c2[None]
    num = jnp.sum(r1 * r2, 1)
    den = jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1)
    return num / jnp.maximum(den, 1e-12)
