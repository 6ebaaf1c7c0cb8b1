import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ti5_isaacgym_tpu.physics import spatial as sp


def rand_quat(key, n=()):
    q = jax.random.normal(key, n + (4,))
    return sp.quat_normalize(q)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    q = rand_quat(key, (32,))
    v = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    R = sp.quat_to_mat(q)
    np.testing.assert_allclose(sp.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-5)
    np.testing.assert_allclose(
        sp.quat_rotate_inverse(q, v), jnp.einsum("nji,nj->ni", R, v), atol=1e-5
    )


def test_mat_quat_roundtrip():
    q = rand_quat(jax.random.PRNGKey(2), (64,))
    q2 = sp.mat_to_quat(sp.quat_to_mat(q))
    # sign ambiguity
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_euler_roundtrip():
    rpy = jax.random.uniform(jax.random.PRNGKey(3), (100, 3), minval=-1.0, maxval=1.0)
    q = sp.quat_from_euler_xyz(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    e = sp.quat_to_euler_xyz(q)
    np.testing.assert_allclose(e, rpy, atol=1e-5)


def test_euler_matches_reference_convention():
    # identity -> zeros; pure yaw pi/2
    np.testing.assert_allclose(
        sp.quat_to_euler_xyz(jnp.array([1.0, 0, 0, 0])), jnp.zeros(3), atol=1e-6
    )
    q = sp.quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.array(jnp.pi / 2))
    np.testing.assert_allclose(sp.quat_to_euler_xyz(q), [0, 0, np.pi / 2], atol=1e-6)


def test_quat_integrate_constant_omega():
    q = sp.quat_identity()
    w = jnp.array([0.0, 0.0, 1.0])
    for _ in range(100):
        q = sp.quat_integrate(q, w, 0.01)
    e = sp.quat_to_euler_xyz(q)
    np.testing.assert_allclose(e[2], 1.0, atol=1e-4)


def test_spatial_inertia_parallel_axis():
    m = jnp.array(2.0)
    com = jnp.array([0.1, 0.0, 0.0])
    I_com = jnp.eye(3) * 0.01
    I_sp = sp.spatial_inertia(m, com, I_com)
    # angular block about origin: I_com + m*(|c|^2 I - c c^T)
    c = np.array([0.1, 0, 0])
    expect = 0.01 * np.eye(3) + 2.0 * (np.dot(c, c) * np.eye(3) - np.outer(c, c))
    np.testing.assert_allclose(I_sp[:3, :3], expect, atol=1e-4)
    np.testing.assert_allclose(I_sp[3:, 3:], 2.0 * np.eye(3), atol=1e-4)


def test_wrap_to_pi():
    a = jnp.array([0.0, jnp.pi + 0.1, -jnp.pi - 0.1, 4 * jnp.pi + 0.3])
    w = sp.wrap_to_pi(a)
    np.testing.assert_allclose(w, [0.0, -np.pi + 0.1, np.pi - 0.1, 0.3], atol=1e-5)
