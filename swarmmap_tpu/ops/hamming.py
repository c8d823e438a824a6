"""Hamming distance as MXU matmuls.

Reference spec: ORBmatcher::DescriptorDistance
(/root/reference/code/src/ORBmatcher.cc:1511-1526) — 256-bit popcount,
called in scalar loops over keypoint pairs.  That loop structure is the
single biggest matmul-shaped surface in the system (SURVEY.md §2.2).

TPU formulation: with descriptors unpacked to {0,1} vectors,
    ham(a, b) = popcount(a) + popcount(b) - 2 a.b
so a full [Nq, Nt] distance matrix is one int8 matmul on the MXU plus
rank-1 corrections — no per-pair code at all.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .brief import unpack_bits


def popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise popcount of uint32 (classic SWAR bit trick)."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def popcount_desc(desc: jnp.ndarray) -> jnp.ndarray:
    """[N,8] u32 -> [N] total bit count."""
    return popcount_u32(desc).sum(axis=-1)


def hamming_matrix(desc_q: jnp.ndarray, desc_t: jnp.ndarray) -> jnp.ndarray:
    """[Nq,8] u32 x [Nt,8] u32 -> [Nq,Nt] int32 Hamming distances."""
    bq = unpack_bits(desc_q)  # [Nq,256] int8
    bt = unpack_bits(desc_t)
    dots = jax.lax.dot_general(
        bq,
        bt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    pq = popcount_desc(desc_q)[:, None]
    pt = popcount_desc(desc_t)[None, :]
    return pq + pt - 2 * dots


def hamming_pairs(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise distance between aligned [N,8] u32 descriptor arrays."""
    return popcount_u32(jnp.bitwise_xor(desc_a, desc_b)).sum(axis=-1)
