import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.core import transforms as tf


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(tf.quat_to_R(jnp.asarray(q)))


def test_rodrigues_roundtrip(rng):
    rvecs = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
    Rs = jax.jit(jax.vmap(tf.rodrigues))(rvecs)
    np.testing.assert_allclose(
        np.asarray(Rs @ jnp.swapaxes(Rs, -1, -2)),
        np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    # rvec defined modulo 2*pi*axis; compare rotations instead
    back = jax.jit(jax.vmap(tf.rodrigues_inv))(Rs)
    Rs2 = jax.jit(jax.vmap(tf.rodrigues))(back)
    np.testing.assert_allclose(np.asarray(Rs), np.asarray(Rs2), atol=1e-4)


def test_rodrigues_small_angle():
    rvec = jnp.array([1e-9, -1e-9, 1e-9])
    R = tf.rodrigues(rvec)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    back = tf.rodrigues_inv(jnp.eye(3))
    np.testing.assert_allclose(np.asarray(back), np.zeros(3), atol=1e-6)


def test_rodrigues_near_pi(rng):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    rvec = axis * (np.pi - 1e-5)
    R = tf.rodrigues(jnp.asarray(rvec))
    back = tf.rodrigues_inv(R)
    R2 = tf.rodrigues(back)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-3)


def test_quat_roundtrip(rng):
    for _ in range(20):
        R = random_rotation(rng)
        q = tf.R_to_quat(jnp.asarray(R))
        R2 = tf.quat_to_R(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_average_rotations_identity_weights(rng):
    R = random_rotation(rng)
    Rs = jnp.stack([jnp.asarray(R)] * 3)
    out = tf.average_rotations_quat(Rs, jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(out), R, atol=1e-5)


def test_average_rotations_hemisphere(rng):
    # two rotations a small angle apart must average between them even if
    # quaternion signs disagree
    r0 = np.array([0.0, 0.0, 0.1])
    r1 = np.array([0.0, 0.0, 0.3])
    R0 = tf.rodrigues(jnp.asarray(r0))
    R1 = tf.rodrigues(jnp.asarray(r1))
    out = tf.average_rotations_quat(jnp.stack([R0, R1]), jnp.array([1.0, 1.0]))
    ang = np.asarray(tf.rodrigues_inv(out))
    np.testing.assert_allclose(ang, [0, 0, 0.2], atol=1e-3)


def test_average_rotations_masked(rng):
    R = random_rotation(rng)
    junk = random_rotation(rng)
    out = tf.average_rotations_quat(
        jnp.stack([jnp.asarray(R), jnp.asarray(junk)]),
        jnp.array([1.0, 5.0]), mask=jnp.array([True, False]))
    np.testing.assert_allclose(np.asarray(out), R, atol=1e-5)


def test_euler_zyx():
    R = tf.euler_zyx_to_R(30.0, 20.0, 10.0)
    z, y, x = tf.R_to_euler_zyx(R)
    np.testing.assert_allclose([float(z), float(y), float(x)],
                               [30.0, 20.0, 10.0], atol=1e-4)


def test_T_builders(rng):
    p = jnp.asarray(rng.normal(size=3).astype(np.float32))
    R = jnp.asarray(random_rotation(rng).astype(np.float32))
    # rotating the fixed point about itself leaves it unchanged
    T = tf.T_rotate_about_point(R, p)
    np.testing.assert_allclose(np.asarray(tf.apply_T(T, p)), np.asarray(p),
                               atol=1e-5)
    Ts = tf.T_scale_about_point(2.0, p)
    np.testing.assert_allclose(np.asarray(tf.apply_T(Ts, p)), np.asarray(p),
                               atol=1e-5)
    q = jnp.asarray(rng.normal(size=3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(tf.apply_T(Ts, q)),
                               np.asarray(2.0 * (q - p) + p), atol=1e-5)
    # invert
    Tinv = tf.invert_T(T)
    np.testing.assert_allclose(np.asarray(T @ Tinv), np.eye(4), atol=1e-5)


def test_flip_z_180():
    R = jnp.eye(3)
    F = tf.flip_z_180(R)
    np.testing.assert_allclose(np.asarray(F), np.diag([-1.0, -1.0, 1.0]),
                               atol=1e-7)


def test_rotation_angle():
    R0 = jnp.eye(3)
    R1 = tf.euler_zyx_to_R(10.0, 0.0, 0.0)
    np.testing.assert_allclose(float(tf.rotation_angle_deg(R0, R1)), 10.0,
                               atol=1e-3)


def test_jit_vmap_compat(rng):
    Rs = jnp.asarray(np.stack([random_rotation(rng) for _ in range(4)]))
    qs = jax.jit(jax.vmap(tf.R_to_quat))(Rs)
    assert qs.shape == (4, 4)
    Rs2 = jax.jit(jax.vmap(tf.quat_to_R))(qs)
    np.testing.assert_allclose(np.asarray(Rs2), np.asarray(Rs), atol=1e-5)
