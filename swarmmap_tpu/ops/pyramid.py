"""Image pyramid + Gaussian blur (device).

Reference spec: ORBextractor::ComputePyramid
(/root/reference/code/src/ORBextractor.cc:821-855) — 8 levels, scale 1.2,
bilinear resize, 7x7 sigma=2 Gaussian before descriptor extraction.

TPU-first: the whole pyramid is built inside one traced program with
static per-level shapes; XLA fuses resize + blur, so the reference's
explicit CUDA-stream pipelining dissolves (SURVEY.md §2.10).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, n_levels: int, scale: float) -> list[tuple[int, int]]:
    return [
        (int(round(h / scale**l)), int(round(w / scale**l))) for l in range(n_levels)
    ]


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian on [H,W] f32 with reflect padding."""
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma))
    r = ksize // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    # vertical pass: sum of shifted rows (unrolled; XLA fuses)
    out = jnp.zeros_like(img)
    for i in range(ksize):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(x, i, img.shape[0], 0)
    x = jnp.pad(out, ((0, 0), (r, r)), mode="reflect")
    out = jnp.zeros_like(img)
    for i in range(ksize):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(x, i, img.shape[1], 1)
    return out


@functools.lru_cache(maxsize=None)
def _resize_weights(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] 2-tap bilinear resize weights (half-pixel centers,
    edge clamp) — the same sampling as cv::resize INTER_LINEAR, which is
    what the reference's ComputePyramid uses (ORBextractor.cc:821)."""
    s = n_in / n_out
    W = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        x = (i + 0.5) * s - 0.5
        x0 = int(np.floor(x))
        f = x - x0
        lo = min(max(x0, 0), n_in - 1)
        hi = min(max(x0 + 1, 0), n_in - 1)
        W[i, lo] += 1.0 - f
        W[i, hi] += f
    return W


def resize_bilinear(img: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Separable bilinear resize as two small matmuls (MXU) — far faster
    on TPU than the gather-based jax.image.resize lowering."""
    h2, w2 = shape
    h1, w1 = img.shape
    Wr = jnp.asarray(_resize_weights(h1, h2))
    Wc = jnp.asarray(_resize_weights(w1, w2))
    # full f32: the default TPU matmul precision is bf16, which would add
    # ±1-intensity noise per chained level
    hp = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(Wr, img, precision=hp), Wc.T, precision=hp)


def build_pyramid(
    img: jnp.ndarray, n_levels: int, scale: float
) -> list[jnp.ndarray]:
    """[H,W] u8/f32 -> list of [h_l,w_l] f32 levels (chained 2-tap
    bilinear, reference ComputePyramid semantics)."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    levels = [img]
    for l in range(1, n_levels):
        # round to integral intensities: the reference's chain resizes
        # u8 -> u8 (cv::resize on CV_8U), and integral levels are exact
        # in bfloat16 for the FAST score chain
        levels.append(jnp.round(resize_bilinear(levels[-1], shapes[l])))
    return levels
