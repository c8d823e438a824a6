"""Steered (rotation-aware) BRIEF-256 descriptors (device).

Reference spec: calcOrb_kernel (/root/reference/code/src/cuda/Orb_gpu.cu:67)
— 256 point-pair intensity comparisons on the blurred pyramid level, with
the sampling pattern rotated by the keypoint's IC angle; packed to 32 bytes.

Two TPU formulations:

* ``compute_descriptors`` — the direct one: one [N, 512] elementwise
  gather + compare + bit-pack.  Exact per-keypoint rotation.  The gather
  runs on the TPU's scalar pipeline and dominates the front-end at
  production keypoint counts.
* ``compute_descriptors_binned`` (default in the extractor) — the MXU
  one: each comparison ``I(b) > I(a)`` is the sign of a dot product
  ``patch · (e_b − e_a)``, so a whole descriptor is the sign vector of
  ``patch @ W``, with W a {−1,0,+1} matrix.  Steering is quantized to
  ``N_BINS`` angle bins (the original ORB paper itself steers in 12°
  increments, 2π/30) and all bins' weight matrices are baked into one
  [K, N_BINS·256] constant, so descriptor extraction for a level is ONE
  [N,K]×[K,8192] bf16 matmul plus a one-hot bin selection — no gathers
  except the N contiguous (P,P) patch slices.

Two sampling patterns are available (``pattern=`` /
``SWARMMAP_ORB_PATTERN``): "synthetic" (deterministic isotropic Gaussian
pairs, sigma = patch/5, clipped to ±13 as in the classic BRIEF
construction — the self-consistent default) and "opencv" (the learned
``bit_pattern_31_`` table, a BSD-licensed public constant transcribed by
tools/extract_orb_pattern.py — pattern-level interop with maps produced
by the reference binary).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_BITS = 256
PATTERN_CLIP = 13  # keeps rotated samples within a 19px border
PATTERN_SEED = 0x5EED

N_BINS = 32            # 11.25° steering quantization (original ORB: 12°)
PATCH_R = 18           # max |round(rotated offset)| over all bins (asserted)
PATCH = 2 * PATCH_R + 1
PATCH_K = PATCH * PATCH


# "synthetic": deterministic Gaussian pairs (self-consistent default).
# "opencv":   OpenCV's learned bit_pattern_31_ (BSD public constant,
#             transcribed by tools/extract_orb_pattern.py) — use for
#             descriptor-level interop with reference-built maps/ORBvoc.
# Override the default with SWARMMAP_ORB_PATTERN=opencv.
import os

DEFAULT_PATTERN = os.environ.get("SWARMMAP_ORB_PATTERN", "synthetic")


@functools.lru_cache(maxsize=None)
def brief_pattern(name: str | None = None) -> np.ndarray:
    """[512, 2] int8 sampling offsets (pairs are (2i, 2i+1))."""
    name = name or DEFAULT_PATTERN
    if name == "opencv":
        from pathlib import Path

        data = Path(__file__).resolve().parent.parent / "data" / \
            "orb_pattern_opencv.npz"
        pts = np.load(data)["pattern"].astype(np.int8)
        assert pts.shape == (2 * N_BITS, 2)
        return pts
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
    pattern: str | None = None,
) -> jnp.ndarray:
    """[H,W] blurred level image + keypoints -> [N,8] uint32 descriptors."""
    h, w = img_blur.shape
    pat = jnp.asarray(brief_pattern(pattern), jnp.float32)  # [512,2]
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


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[N,256] {0,1} -> [N,8] uint32."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(
        bits.astype(jnp.uint32).reshape(-1, 8, 32) << shifts[None, None, :],
        axis=2, dtype=jnp.uint32,
    )


@functools.lru_cache(maxsize=None)
def _binned_weights(pattern: str | None = None) -> np.ndarray:
    """[PATCH_K, N_BINS*256] int8 comparison weights.

    Column (b*256 + s) holds +1 at the flattened patch offset of sample
    2s+1 rotated by bin angle b, and −1 at sample 2s; a rounding collision
    (both samples land on the same pixel) cancels to 0, so the bit decides
    as ``v > 0`` = False — identical to the direct compare ``v_a < v_b``.
    """
    pat = brief_pattern(pattern).astype(np.float64)
    W = np.zeros((N_BINS, PATCH_K, N_BITS), np.int8)
    for b in range(N_BINS):
        th = 2.0 * np.pi * b / N_BINS
        ca, sa = np.cos(th), np.sin(th)
        rx = np.round(pat[:, 0] * ca - pat[:, 1] * sa).astype(np.int64)
        ry = np.round(pat[:, 0] * sa + pat[:, 1] * ca).astype(np.int64)
        assert np.abs(rx).max() <= PATCH_R and np.abs(ry).max() <= PATCH_R
        idx = (ry + PATCH_R) * PATCH + (rx + PATCH_R)
        for s in range(N_BITS):
            W[b, idx[2 * s + 1], s] += 1
            W[b, idx[2 * s], s] -= 1
    return np.ascontiguousarray(W.transpose(1, 0, 2).reshape(PATCH_K, N_BINS * N_BITS))


def angle_bins(angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Quantize IC angles to the N_BINS steering bins."""
    b = jnp.round(angles_deg * (N_BINS / 360.0)).astype(jnp.int32)
    return jnp.mod(b, N_BINS)


def extract_patches(img_blur: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """[H,W] integral-intensity image + [N,2] keypoints ->
    [N, PATCH, PATCH] patches.

    Gather-free: rows then columns are selected by one-hot bf16 matmuls
    (MXU), which beats XLA's per-keypoint dynamic-slice lowering ~4x at
    production keypoint counts.  Exact for integral intensities ≤ 255
    (one-hot weights and u8 values are both exact in bfloat16).

    The image is edge-padded so the full patch is always in bounds for
    keypoints inside the FAST detection border (16 px); edge replication
    matches the direct path's coordinate clamping.
    """
    h, w = img_blur.shape
    imgp = jnp.pad(img_blur, PATCH_R, mode="edge")
    hp, wp = imgp.shape
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    n = xy.shape[0]
    offs = jnp.arange(PATCH, dtype=jnp.int32)
    hi = jax.lax.broadcasted_iota(jnp.int32, (n, PATCH, hp), 2)
    row_oh = (hi == (cy[:, None, None] + offs[None, :, None])).astype(jnp.bfloat16)
    rows = jnp.einsum("nrh,hw->nrw", row_oh, imgp.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    wi = jax.lax.broadcasted_iota(jnp.int32, (n, wp, PATCH), 1)
    col_oh = (wi == (cx[:, None, None] + offs[None, None, :])).astype(jnp.bfloat16)
    return jnp.einsum("nrw,nwc->nrc", rows.astype(jnp.bfloat16), col_oh,
                      preferred_element_type=jnp.float32)


def descriptors_from_patches(
    patches: jnp.ndarray,
    angles_deg: jnp.ndarray,
    valid: jnp.ndarray,
    pattern: str | None = None,
) -> jnp.ndarray:
    """[N, PATCH, PATCH] integral-intensity patches -> [N,8] uint32.

    The matmul half of the binned path, split out so the extractor can
    batch ALL pyramid levels' patches into ONE [N_total,K]×[K,32·256]
    MXU dispatch instead of 8 small under-utilizing ones.
    """
    Pm = patches.reshape(-1, PATCH_K).astype(jnp.bfloat16)
    W = jnp.asarray(_binned_weights(pattern), jnp.bfloat16)
    vals = jnp.dot(Pm, W, preferred_element_type=jnp.float32)
    vals = vals.reshape(-1, N_BINS, N_BITS)
    onehot = jax.nn.one_hot(angle_bins(angles_deg), N_BINS, dtype=jnp.float32)
    v = jnp.einsum("nbs,nb->ns", vals, onehot)
    return jnp.where(valid[:, None], _pack_bits(v > 0), jnp.uint32(0))


def compute_descriptors_binned(
    img_blur: jnp.ndarray,
    xy: jnp.ndarray,
    angles_deg: jnp.ndarray,
    valid: jnp.ndarray,
    pattern: str | None = None,
) -> jnp.ndarray:
    """MXU-path descriptors: [H,W] blurred level -> [N,8] uint32.

    The blurred image is rounded to integral intensities first (the
    reference blurs into 8-bit images), which makes every value exact in
    bfloat16 (integers ≤ 256), so the sign of the bf16 matmul equals the
    exact comparison.
    """
    img_u = jnp.round(jnp.clip(img_blur, 0.0, 255.0))
    patches = extract_patches(img_u, xy)
    return descriptors_from_patches(patches, angles_deg, valid, pattern)


def unpack_bits(desc_u32: jnp.ndarray) -> jnp.ndarray:
    """[N,8] u32 -> [N,256] {0,1} int8 (for MXU Hamming matmuls)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc_u32[..., None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc_u32.shape[0], 256).astype(jnp.int8)
