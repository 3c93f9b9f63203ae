import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from slam1_tpu.ops import se3


def random_twists(key, n, rot_scale=1.0, trans_scale=2.0):
    k1, k2 = jax.random.split(key)
    rho = jax.random.normal(k1, (n, 3)) * trans_scale
    phi = jax.random.normal(k2, (n, 3)) * rot_scale
    return jnp.concatenate([rho, phi], axis=-1)


def test_exp_so3_matches_scipy(rng):
    phi = np.asarray(jax.random.normal(rng, (64, 3))) * 1.5
    R_ours = np.asarray(se3.exp_so3(jnp.asarray(phi)))
    R_scipy = ScipyRot.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)


def test_log_so3_roundtrip(rng):
    phi = np.asarray(jax.random.normal(rng, (64, 3)))
    # keep |phi| < pi for uniqueness
    norm = np.linalg.norm(phi, axis=-1, keepdims=True)
    phi = phi / norm * (norm % 3.0)
    R = se3.exp_so3(jnp.asarray(phi))
    phi2 = np.asarray(se3.log_so3(R))
    np.testing.assert_allclose(phi2, phi, atol=1e-4)


def test_log_so3_small_angle():
    phi = jnp.array([[1e-6, -2e-6, 3e-7], [0.0, 0.0, 0.0]])
    R = se3.exp_so3(phi)
    np.testing.assert_allclose(np.asarray(se3.log_so3(R)), np.asarray(phi),
                               atol=1e-7)


def test_exp_log_se3_roundtrip(rng):
    # log(exp) is only the identity for |phi| < pi
    xi = random_twists(rng, 64, rot_scale=0.9)
    T = se3.exp_se3(xi)
    xi2 = se3.log_se3(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-3)


def test_se3_inverse_compose(rng):
    xi = random_twists(rng, 16)
    T = se3.exp_se3(xi)
    eye = np.broadcast_to(np.eye(4), T.shape)
    np.testing.assert_allclose(np.asarray(T @ se3.inverse(T)), eye, atol=1e-5)


def test_transform_points(rng):
    k1, k2 = jax.random.split(rng)
    T = se3.exp_se3(random_twists(k1, 1)[0])
    X = jax.random.normal(k2, (32, 3))
    got = se3.transform_points(T, X)
    want = (np.asarray(T[:3, :3]) @ np.asarray(X).T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_rotation_angle(rng):
    phi = jnp.array([[0.3, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = se3.exp_so3(phi)
    ang = np.asarray(se3.rotation_angle(R))
    np.testing.assert_allclose(ang, [0.3, 0.0], atol=1e-5)


def test_orthonormalize(rng):
    R = se3.exp_so3(jax.random.normal(rng, (8, 3)))
    noisy = R + 0.01 * jax.random.normal(rng, (8, 3, 3))
    R2 = se3.orthonormalize(noisy)
    eye = np.broadcast_to(np.eye(3), (8, 3, 3))
    np.testing.assert_allclose(
        np.asarray(R2 @ jnp.swapaxes(R2, -1, -2)), eye, atol=1e-5)
    assert np.all(np.asarray(jnp.linalg.det(R2)) > 0.99)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(se3.exp_se3))
    out = f(jnp.zeros((4, 6)))
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(np.eye(4), (4, 4, 4)))
