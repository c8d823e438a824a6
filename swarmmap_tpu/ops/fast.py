"""FAST corner detection as a whole-image vector program.

Reference spec: tileCalcKeypoints_kernel
(/root/reference/code/src/cuda/Fast_gpu.cu:284-341): Bresenham-circle
segment test, per-pixel corner score, 3x3 non-max suppression, two-pass
threshold (high, then low for tiles where high found nothing), capped
compaction of (location, score) pairs.

TPU-native formulation: instead of per-thread scalar tests we compute the
*exact max-threshold corner score* for every pixel at once:

    score(p) = max over the 16 arc starts of
               min over the 9 contiguous circle pixels of |I(c) - I(p)|
               (per brightness polarity)

so ``corner at threshold t  <=>  score > t`` — the segment test and the
score collapse into one dense VPU computation (16 shifted images, 256
fused min/max ops), and NMS is a reduce_window.  Compaction is a
per-cell-max bonus + global top_k instead of atomic append, which also
subsumes the reference's CPU quadtree distribution
(ORBextractor::DistributeOctTree, ORBextractor.cc:465): the per-cell
winner bonus guarantees spatial spread, the top_k enforces the budget.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, 16 pixels, clockwise from 12 o'clock.
# Public-domain constant from the FAST detector definition (Rosten 2006).
CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
ARC_LEN = 9  # contiguous segment length for the FAST-9 test


def fast_score_map(img: jnp.ndarray) -> jnp.ndarray:
    """[H,W] f32 -> [H,W] f32 max-threshold corner score.

    score > t  iff  pixel passes the FAST-9 segment test at threshold t.

    The 256-op min/max chain runs in bfloat16: pyramid levels are
    integral intensities (build_pyramid rounds, mirroring the
    reference's u8 chain), whose differences are integers |d| <= 255 —
    exact in bf16 — so the returned f32 score is bit-identical to an
    all-f32 evaluation at half the VPU/memory traffic.
    """
    img = img.astype(jnp.bfloat16)
    h, w = img.shape
    pad = jnp.pad(img, 3, mode="edge")
    diffs = [
        jax.lax.dynamic_slice(pad, (3 + dy, 3 + dx), (h, w)) - img
        for (dx, dy) in CIRCLE
    ]
    ninf = jnp.asarray(-jnp.inf, jnp.bfloat16)
    bright = jnp.full((h, w), ninf)
    dark = jnp.full((h, w), ninf)
    for s in range(16):
        bmin = diffs[s % 16]
        dmin = -diffs[s % 16]
        for k in range(1, ARC_LEN):
            d = diffs[(s + k) % 16]
            bmin = jnp.minimum(bmin, d)
            dmin = jnp.minimum(dmin, -d)
        bright = jnp.maximum(bright, bmin)
        dark = jnp.maximum(dark, dmin)
    return jnp.maximum(bright, dark).astype(jnp.float32)


def _maxpool3(score: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )


def _tile_any(mask: jnp.ndarray, tile: int) -> jnp.ndarray:
    """Per-tile OR, broadcast back to full resolution. H,W must be
    multiples of `tile` (caller pads)."""
    h, w = mask.shape
    t = mask.reshape(h // tile, tile, w // tile, tile).any(axis=(1, 3))
    return jnp.repeat(jnp.repeat(t, tile, 0), tile, 1)


def _cell_max(score: jnp.ndarray, cell: int) -> jnp.ndarray:
    h, w = score.shape
    m = score.reshape(h // cell, cell, w // cell, cell).max(axis=(1, 3))
    return jnp.repeat(jnp.repeat(m, cell, 0), cell, 1)


class Keypoints(NamedTuple):
    xy: jnp.ndarray        # [N,2] f32 (x=col, y=row), level coords
    score: jnp.ndarray     # [N] f32
    valid: jnp.ndarray     # [N] bool


def detect_fast(
    img: jnp.ndarray,
    n_keypoints: int,
    th_high: float = 20.0,
    th_low: float = 7.0,
    border: int = 16,
    tile: int = 32,
    cell: int = 32,
) -> Keypoints:
    """Full FAST pipeline on one pyramid level.

    Two-threshold retry (reference: Fast_gpu.cu:320-340): pixels pass at
    th_high, or at th_low if their tile produced no high-threshold corner.
    Selection: NMS survivors ranked by score with a +inf-ish bonus for each
    cell's best corner (spatial spread), then global top_k(n_keypoints).
    """
    h, w = img.shape
    ph = (tile - h % tile) % tile
    pw = (tile - w % tile) % tile
    score = fast_score_map(img)
    if ph or pw:
        score = jnp.pad(score, ((0, ph), (0, pw)), constant_values=-jnp.inf)
    hh, ww = score.shape

    ys = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
    in_border = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    score = jnp.where(in_border, score, -jnp.inf)

    nms_ok = score >= _maxpool3(score)
    hi = nms_ok & (score > th_high)
    tile_has_hi = _tile_any(hi, tile)
    keep = hi | (nms_ok & (score > th_low) & ~tile_has_hi)
    masked = jnp.where(keep, score, -jnp.inf)

    # spatial-spread bonus: each cell's best corner outranks all non-winners
    bonus = jnp.where(
        (masked == _cell_max(masked, cell)) & keep, jnp.float32(1e6), 0.0
    )
    priority = masked + bonus

    # approx_max_k: TPU-native partial reduction (full top_k lowers to a
    # row sort — ~0.5ms per level at VGA); keypoint budgeting only needs
    # "the best ~N", not exact order
    vals, idx = jax.lax.approx_max_k(
        priority.reshape(-1), n_keypoints, recall_target=0.95
    )
    yx = jnp.stack([idx % ww, idx // ww], axis=-1).astype(jnp.float32)  # (x, y)
    valid = vals > -jnp.inf
    kp_score = jnp.take(masked.reshape(-1), idx)
    return Keypoints(xy=yx, score=jnp.where(valid, kp_score, 0.0), valid=valid)
