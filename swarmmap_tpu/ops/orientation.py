"""Intensity-centroid keypoint orientation (device).

Reference spec: IC_Angle_kernel (/root/reference/code/src/cuda/Fast_gpu.cu:403)
— moments m01/m10 over a circular patch of radius 15 around each keypoint,
angle = atan2(m01, m10).

TPU formulation: one batched gather of the [31,31] patch per keypoint
(keypoints are already a fixed-size padded array), followed by two masked
weighted reductions — no warp shuffles, no shared memory.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15


@functools.lru_cache(maxsize=None)
def _patch_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """dx, dy, circular mask for the 31x31 orientation patch.

    Circle defined by the same per-row extent rule as the reference's
    u_max table (umax[v] = round(sqrt(15^2 - v^2)))."""
    r = HALF_PATCH
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    umax = np.round(np.sqrt(np.maximum(r * r - np.arange(r + 1) ** 2, 0))).astype(int)
    mask = np.abs(dx) <= umax[np.abs(dy)]
    return dx.astype(np.float32), dy.astype(np.float32), mask.astype(np.float32)


def ic_angles(img: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Angles in degrees [0,360) for keypoints xy [N,2] on [H,W] image."""
    h, w = img.shape
    dx, dy, mask = (jnp.asarray(t) for t in _patch_tables())
    x = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), HALF_PATCH, w - HALF_PATCH - 1)
    y = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), HALF_PATCH, h - HALF_PATCH - 1)
    # flat gather indices [N, 31*31]
    gy = y[:, None, None] + dy.astype(jnp.int32)[None]
    gx = x[:, None, None] + dx.astype(jnp.int32)[None]
    patch = jnp.take(img.reshape(-1), (gy * w + gx).reshape(x.shape[0], -1), axis=0)
    patch = patch.reshape(-1, 2 * HALF_PATCH + 1, 2 * HALF_PATCH + 1)
    wmask = mask[None]
    m10 = jnp.sum(patch * dx[None] * wmask, axis=(1, 2))
    m01 = jnp.sum(patch * dy[None] * wmask, axis=(1, 2))
    ang = jnp.degrees(jnp.arctan2(m01, m10))
    ang = jnp.where(ang < 0, ang + 360.0, ang)
    return jnp.where(valid, ang, 0.0)
