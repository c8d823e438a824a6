"""The fused ORB front-end device program.

Reference spec: ORBextractor::operator()
(/root/reference/code/src/ORBextractor.cc:746-819): pyramid -> per-level
FAST + octree distribution -> IC angles -> Gaussian blur -> descriptors,
software-pipelined across CUDA streams.

TPU-native: the entire per-frame front-end (all pyramid levels) is ONE
jitted XLA program with static shapes; levels are unrolled subgraphs and
XLA handles overlap — no explicit streams.  Output is a fixed-capacity
keypoint set (padded, masked) so every downstream op keeps static shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import brief, fast, orientation, pyramid


class FrameFeatures(NamedTuple):
    xy: jnp.ndarray       # [N,2] f32 level-0 (distorted) pixel coords
    response: jnp.ndarray # [N] f32 FAST score
    octave: jnp.ndarray   # [N] i32 pyramid level
    angle: jnp.ndarray    # [N] f32 degrees
    desc: jnp.ndarray     # [N,8] uint32 packed rBRIEF
    valid: jnp.ndarray    # [N] bool

    @property
    def n(self) -> int:
        return self.xy.shape[0]


def level_budgets(n_features: int, n_levels: int, scale: float) -> list[int]:
    """Per-level keypoint budget, geometric in 1/scale with the remainder
    on the coarsest level (reference: ORBextractor.cc ctor)."""
    inv = 1.0 / scale
    factor = n_features * (1 - inv) / (1 - inv**n_levels)
    budgets = [int(round(factor * inv**l)) for l in range(n_levels - 1)]
    budgets.append(max(n_features - sum(budgets), 0))
    return budgets


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_features", "n_levels", "scale", "th_high", "th_low", "desc_mode",
        "desc_pattern",
    ),
)
def extract_orb(
    img: jnp.ndarray,
    n_features: int = 1000,
    n_levels: int = 8,
    scale: float = 1.2,
    th_high: float = 20.0,
    th_low: float = 7.0,
    desc_mode: str = "binned",
    desc_pattern: str | None = None,
) -> FrameFeatures:
    """[H,W] u8/f32 -> FrameFeatures with N = n_features rounded up to 128.

    desc_mode selects the rBRIEF formulation: "binned" (default) steers
    by quantized angle bins and computes every descriptor as one MXU
    matmul sign (~2x faster front-end on TPU); "exact" rotates the
    pattern per keypoint and gathers (bit-stable with older maps).
    desc_pattern picks the sampling pattern: None -> brief.DEFAULT_PATTERN
    ("synthetic", or SWARMMAP_ORB_PATTERN=opencv for descriptor interop
    with reference-built maps).
    """
    levels = pyramid.build_pyramid(img, n_levels, scale)
    budgets = level_budgets(n_features, n_levels, scale)
    n_total = _round_up(sum(budgets), 128)

    binned = desc_mode == "binned"
    xs, resps, octs, angs, descs, vals, patches = [], [], [], [], [], [], []
    for l, (lvl_img, budget) in enumerate(zip(levels, budgets)):
        if budget == 0 or min(lvl_img.shape) <= 2 * 16 + 8:
            continue
        kps = fast.detect_fast(lvl_img, budget, th_high=th_high, th_low=th_low)
        m10, m01 = orientation.moment_maps(lvl_img)
        ang = orientation.ic_angles_conv(m10, m01, kps.xy, kps.valid)
        blurred = pyramid.gaussian_blur(lvl_img)
        if binned:
            # defer the descriptor matmul: collect every level's patches
            # and run ONE [N_total,K]x[K,32*256] MXU dispatch below
            patches.append(brief.extract_patches(
                jnp.round(jnp.clip(blurred, 0.0, 255.0)), kps.xy))
        else:
            descs.append(brief.compute_descriptors(
                blurred, kps.xy, ang, kps.valid, pattern=desc_pattern))
        s = jnp.float32(scale**l)
        xs.append(kps.xy * s)
        resps.append(kps.score)
        octs.append(jnp.full((budget,), l, jnp.int32))
        angs.append(ang)
        vals.append(kps.valid)

    xy = jnp.concatenate(xs, 0)
    response = jnp.concatenate(resps, 0)
    octave = jnp.concatenate(octs, 0)
    angle = jnp.concatenate(angs, 0)
    valid = jnp.concatenate(vals, 0)
    if binned:
        desc = brief.descriptors_from_patches(
            jnp.concatenate(patches, 0), angle, valid, pattern=desc_pattern)
    else:
        desc = jnp.concatenate(descs, 0)
    pad = n_total - xy.shape[0]
    if pad > 0:
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        response = jnp.pad(response, (0, pad))
        octave = jnp.pad(octave, (0, pad))
        angle = jnp.pad(angle, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    return FrameFeatures(xy, response, octave, angle, desc, valid)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_features", "n_levels", "scale", "th_high", "th_low", "desc_mode",
        "desc_pattern",
    ),
)
def extract_orb_batched(
    images: jnp.ndarray,
    n_features: int = 1000,
    n_levels: int = 8,
    scale: float = 1.2,
    th_high: float = 20.0,
    th_low: float = 7.0,
    desc_mode: str = "binned",
    desc_pattern: str | None = None,
) -> FrameFeatures:
    """[A,H,W] -> FrameFeatures with leading agent axis — the combined
    mode's N per-agent extractions as ONE device program (SURVEY.md §2.10
    agent data parallelism)."""
    fn = functools.partial(
        extract_orb, n_features=n_features, n_levels=n_levels,
        scale=scale, th_high=th_high, th_low=th_low,
        desc_mode=desc_mode, desc_pattern=desc_pattern,
    )
    return jax.vmap(fn)(images)


def undistort_points(
    xy: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray, iters: int = 5
) -> jnp.ndarray:
    """Iterative radial-tangential undistortion (reference:
    Frame::UndistortKeyPoints, Frame.cc — via cv::undistortPoints)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    xn = (xy[:, 0] - cx) / fx
    yn = (xy[:, 1] - cy) / fy
    x, y = xn, yn
    for _ in range(iters):
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + r2 * (k1 + r2 * (k2 + r2 * k3)))
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x = (xn - dx) * icdist
        y = (yn - dy) * icdist
    return jnp.stack([x * fx + cx, y * fy + cy], -1)


def scale_sigma2(n_levels: int, scale: float) -> np.ndarray:
    """Per-octave sigma^2 (reference: ORBextractor mvLevelSigma2)."""
    return (scale ** (2.0 * np.arange(n_levels))).astype(np.float32)
