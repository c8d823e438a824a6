"""Steered (rotation-aware) BRIEF-256 descriptors (device).

Reference spec: calcOrb_kernel (/root/reference/code/src/cuda/Orb_gpu.cu:67)
— 256 point-pair intensity comparisons on the blurred pyramid level, with
the sampling pattern rotated by the keypoint's IC angle; packed to 32 bytes.

TPU formulation: one [N, 512] gather + compare + bit-pack.  The sampling
pattern is generated deterministically here (isotropic Gaussian pairs,
sigma = patch/5, clipped to +-13 as in the classic BRIEF construction) —
descriptors are self-consistent within this framework rather than
bit-compatible with OpenCV's learned pattern, which only matters for
interop with maps produced by the reference binary (tracked as a parity
item in PARITY.md).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

N_BITS = 256
PATTERN_CLIP = 13  # keeps rotated samples within a 19px border
PATTERN_SEED = 0x5EED


@functools.lru_cache(maxsize=None)
def brief_pattern() -> np.ndarray:
    """[512, 2] int8 sampling offsets (pairs are (2i, 2i+1))."""
    rng = np.random.RandomState(PATTERN_SEED)
    pts = np.clip(
        np.round(rng.normal(0.0, 31 / 5.0, size=(2 * N_BITS, 2))),
        -PATTERN_CLIP,
        PATTERN_CLIP,
    ).astype(np.int8)
    # avoid degenerate identical pairs
    for i in range(N_BITS):
        if np.all(pts[2 * i] == pts[2 * i + 1]):
            pts[2 * i + 1, 0] = min(pts[2 * i + 1, 0] + 1, PATTERN_CLIP)
    return pts


def compute_descriptors(
    img_blur: jnp.ndarray,
    xy: jnp.ndarray,
    angles_deg: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """[H,W] blurred level image + keypoints -> [N,8] uint32 descriptors."""
    h, w = img_blur.shape
    pat = jnp.asarray(brief_pattern(), jnp.float32)  # [512,2]
    a = jnp.radians(angles_deg)
    ca, sa = jnp.cos(a), jnp.sin(a)
    # rotate pattern: x' = x ca - y sa ; y' = x sa + y ca  (per keypoint)
    px, py = pat[:, 0], pat[:, 1]
    rx = jnp.round(px[None] * ca[:, None] - py[None] * sa[:, None])
    ry = jnp.round(px[None] * sa[:, None] + py[None] * ca[:, None])
    gx = jnp.clip(jnp.round(xy[:, 0:1]) + rx, 0, w - 1).astype(jnp.int32)
    gy = jnp.clip(jnp.round(xy[:, 1:2]) + ry, 0, h - 1).astype(jnp.int32)
    vals = jnp.take(img_blur.reshape(-1), gy * w + gx)  # [N,512]
    bits = (vals[:, 0::2] < vals[:, 1::2]).astype(jnp.uint32)  # [N,256]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(
        bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=2, dtype=jnp.uint32
    )
    return jnp.where(valid[:, None], packed, jnp.uint32(0))


def unpack_bits(desc_u32: jnp.ndarray) -> jnp.ndarray:
    """[N,8] u32 -> [N,256] {0,1} int8 (for MXU Hamming matmuls)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc_u32[..., None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc_u32.shape[0], 256).astype(jnp.int8)
