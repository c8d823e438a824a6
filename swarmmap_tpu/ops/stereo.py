"""Rectified stereo matching -> per-keypoint depth (device).

Reference spec: Frame::ComputeStereoMatches (code/src/Frame.cc, upstream
ORB-SLAM2 stereo path — built here even though the reference's root CMake
only wires the monocular binaries): row-banded descriptor matching
between rectified left/right features, disparity -> depth via the
horizontal baseline.

TPU formulation: one masked dense match with a row/disparity-band gate.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import matching

TH_STEREO = (matching.TH_HIGH + matching.TH_LOW) // 2  # 75, as the reference


def stereo_depths(
    xyL: jnp.ndarray, descL: jnp.ndarray, octaveL: jnp.ndarray, validL: jnp.ndarray,
    xyR: jnp.ndarray, descR: jnp.ndarray, octaveR: jnp.ndarray, validR: jnp.ndarray,
    fx: float, baseline: float,
    scale: float = 1.2,
    min_disp: float = 0.5,
    max_disp: float = 200.0,
    row_band: float = 2.0,
) -> jnp.ndarray:
    """Returns per-left-keypoint depth [N] (<=0 where unmatched)."""
    sigma = scale ** octaveL.astype(jnp.float32)
    dv = jnp.abs(xyL[:, 1:2] - xyR[None, :, 1])
    disp = xyL[:, 0:1] - xyR[None, :, 0]
    mask = (
        (dv <= row_band * sigma[:, None])
        & (disp >= min_disp) & (disp <= max_disp)
        & (jnp.abs(octaveL[:, None] - octaveR[None, :]) <= 1)
        & validL[:, None] & validR[None, :]
    )
    m = matching.masked_match(descL, descR, mask, max_dist=TH_STEREO, ratio=0.0)
    best_disp = xyL[:, 0] - xyR[m.idx, 0]
    depth = fx * baseline / jnp.maximum(best_disp, 1e-6)
    return jnp.where(m.valid & (best_disp >= min_disp), depth, -1.0)
