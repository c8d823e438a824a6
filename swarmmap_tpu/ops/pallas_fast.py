"""FAST-9 corner scoring as a Pallas TPU kernel.

Reference counterpart: tileCalcKeypoints_kernel
(/root/reference/code/src/cuda/Fast_gpu.cu:284) — the reference's hottest
CUDA kernel.

The pure-XLA formulation (ops/fast.py) already fuses well; this kernel
pins the schedule explicitly: the image is split into horizontal bands
(with a 3-pixel halo), each grid program holds its band in VMEM, computes
all 16 circle differences and the 16 arc-minima in registers, and writes
the max-threshold score band — one HBM read + one write per pixel,
no intermediate score tensors in HBM.

Semantics identical to ops.fast.fast_score_map (golden-tested); the
public entry falls back to the XLA path off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import ARC_LEN, CIRCLE, fast_score_map as _xla_score_map

BAND = 128      # rows per grid program
HALO = 3        # circle radius


def _fast_band_kernel(img_ref, out_ref):
    """img_ref: [1, BAND + 2*HALO, W + 2*HALO] f32 (edge-padded band);
    out_ref: [1, BAND, W] f32 score band."""
    band = img_ref[0]
    h = out_ref.shape[1]
    w = out_ref.shape[2]
    center = band[HALO : HALO + h, HALO : HALO + w]
    diffs = [
        band[HALO + dy : HALO + dy + h, HALO + dx : HALO + dx + w] - center
        for (dx, dy) in CIRCLE
    ]
    bright = jnp.full_like(center, -jnp.inf)
    dark = jnp.full_like(center, -jnp.inf)
    for s in range(16):
        bmin = diffs[s % 16]
        dmin = -diffs[s % 16]
        for k in range(1, ARC_LEN):
            d = diffs[(s + k) % 16]
            bmin = jnp.minimum(bmin, d)
            dmin = jnp.minimum(dmin, -d)
        bright = jnp.maximum(bright, bmin)
        dark = jnp.maximum(dark, dmin)
    out_ref[0] = jnp.maximum(bright, dark)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_score_map_pallas(img: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """[H,W] -> [H,W] FAST-9 max-threshold score via banded Pallas kernel.

    Overlapping halos can't be expressed through BlockSpec index maps
    (they step in whole-block units), so the overlapping bands are
    materialized first — one gather duplicating 2*HALO rows per band —
    and the kernel runs on non-overlapping 3-D blocks."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    n_bands = pl.cdiv(h, BAND)
    hp = n_bands * BAND
    padded = jnp.pad(img, ((HALO, hp - h + HALO), (HALO, HALO)), mode="edge")
    # bands[i] = rows [i*BAND, i*BAND + BAND + 2*HALO)
    idx = (jnp.arange(n_bands) * BAND)[:, None] + jnp.arange(BAND + 2 * HALO)[None]
    bands = padded[idx.reshape(-1)].reshape(n_bands, BAND + 2 * HALO, w + 2 * HALO)

    out = pl.pallas_call(
        _fast_band_kernel,
        out_shape=jax.ShapeDtypeStruct((n_bands, BAND, w), jnp.float32),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec((1, BAND + 2 * HALO, w + 2 * HALO),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, BAND, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bands)
    return out.reshape(hp, w)[:h]


def fast_score_map(img: jnp.ndarray) -> jnp.ndarray:
    """Public entry: Pallas on TPU, XLA elsewhere."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        on_tpu = False
    if on_tpu:
        return fast_score_map_pallas(img)
    return _xla_score_map(img)
