import numpy as np
import jax.numpy as jnp

from swarmmap_tpu.ops import lie


def random_rotations(rng, n):
    w = rng.randn(n, 3)
    return np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))


def test_so3_exp_log_roundtrip(rng):
    w = rng.uniform(-2.0, 2.0, (64, 3)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-5)


def test_so3_orthonormal(rng):
    w = rng.randn(32, 3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.uniform(-1.0, 1.0, (64, 6)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)


def test_se3_inverse(rng):
    xi = rng.randn(16, 6).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    I = np.asarray(T @ lie.se3_inv(T))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.uniform(-0.8, 0.8, (64, 7)).astype(np.float32)
    xi[:, 6] *= 0.5  # moderate log-scales
    R, t, s = lie.sim3_exp(jnp.asarray(xi))
    xi2 = lie.sim3_log(R, t, s)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=2e-4)


def test_sim3_mul_inv(rng):
    xi = rng.uniform(-0.5, 0.5, (8, 7)).astype(np.float32)
    R, t, s = lie.sim3_exp(jnp.asarray(xi))
    Ri, ti, si = lie.sim3_inv(R, t, s)
    Rm, tm, sm = lie.sim3_mul(R, t, s, Ri, ti, si)
    np.testing.assert_allclose(np.asarray(Rm), np.broadcast_to(np.eye(3), Rm.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tm), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sm), 1.0, atol=1e-5)


def test_sim3_apply_composition(rng):
    xi1 = rng.uniform(-0.5, 0.5, (7,)).astype(np.float32)
    xi2 = rng.uniform(-0.5, 0.5, (7,)).astype(np.float32)
    p = rng.randn(10, 3).astype(np.float32)
    R1, t1, s1 = lie.sim3_exp(jnp.asarray(xi1))
    R2, t2, s2 = lie.sim3_exp(jnp.asarray(xi2))
    Rm, tm, sm = lie.sim3_mul(R1, t1, s1, R2, t2, s2)
    a = lie.sim3_apply(Rm, tm, sm, jnp.asarray(p))
    b = lie.sim3_apply(R1, t1, s1, lie.sim3_apply(R2, t2, s2, jnp.asarray(p)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
