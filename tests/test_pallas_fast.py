"""Pallas FAST kernel golden test vs the XLA formulation (interpret mode
on the CPU test platform)."""
import numpy as np
import jax.numpy as jnp

from swarmmap_tpu.ops import fast, pallas_fast


def test_pallas_fast_matches_xla(rng):
    img = rng.randint(0, 255, (200, 256)).astype(np.float32)
    want = np.asarray(fast.fast_score_map(jnp.asarray(img)))
    got = np.asarray(pallas_fast.fast_score_map_pallas(jnp.asarray(img), interpret=True))
    inner = (slice(3, -3), slice(3, -3))
    np.testing.assert_allclose(got[inner], want[inner], atol=1e-4)


def test_pallas_fast_nonmultiple_band(rng):
    img = rng.randint(0, 255, (150, 192)).astype(np.float32)  # h % 128 != 0
    want = np.asarray(fast.fast_score_map(jnp.asarray(img)))
    got = np.asarray(pallas_fast.fast_score_map_pallas(jnp.asarray(img), interpret=True))
    inner = (slice(3, -3), slice(3, -3))
    np.testing.assert_allclose(got[inner], want[inner], atol=1e-4)
