"""Golden tests for the L0 math layer against independent formulas."""
import jax.numpy as jnp
import numpy as np
import pytest

from mupe_tpu.core import (
    cpos,
    euler_to_quaternion,
    off_diag,
    quat_axis,
    quat_mul,
    quat_rotate,
    quat_rotate_inverse,
    quaternion_to_euler,
    quaternion_to_rotation_matrix,
)


def random_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = random_quat(rng, (32,))
    v = jnp.asarray(rng.normal(size=(32, 3)))
    r = quaternion_to_rotation_matrix(q)
    np.testing.assert_allclose(
        quat_rotate(q, v), jnp.einsum("bij,bj->bi", r, v), atol=1e-5
    )
    np.testing.assert_allclose(
        quat_rotate_inverse(q, v), jnp.einsum("bji,bj->bi", r, v), atol=1e-5
    )


def test_quat_mul_composes_rotation():
    rng = np.random.default_rng(1)
    q1, q2 = random_quat(rng, (8,)), random_quat(rng, (8,))
    v = jnp.asarray(rng.normal(size=(8, 3)))
    np.testing.assert_allclose(
        quat_rotate(quat_mul(q1, q2), v),
        quat_rotate(q1, quat_rotate(q2, v)),
        atol=1e-5,
    )


def test_euler_round_trip():
    rng = np.random.default_rng(2)
    rpy = jnp.asarray(rng.uniform(-1.0, 1.0, size=(16, 3)))
    q = euler_to_quaternion(rpy)
    np.testing.assert_allclose(quaternion_to_euler(q), rpy, atol=1e-5)


def test_euler_to_quaternion_yaw_only():
    # yaw of pi/2 about z
    q = euler_to_quaternion(jnp.asarray([0.0, 0.0, np.pi / 2]))
    v = quat_rotate(q, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_quat_axis_identity():
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(quat_axis(q, 0), [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(quat_axis(q, 2), [0.0, 0.0, 1.0], atol=1e-6)


def test_off_diag_and_cpos():
    a = jnp.arange(9).reshape(3, 3)
    od = off_diag(a[..., None])
    # row i keeps every column except i
    np.testing.assert_array_equal(od[:, :, 0], [[1, 2], [3, 5], [6, 7]])
    p = jnp.asarray([[0.0, 0.0], [1.0, 0.0]])
    rel = cpos(p, p)
    np.testing.assert_allclose(rel[1, 0], [1.0, 0.0])


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_quat_axis_matches_matrix_column(axis):
    rng = np.random.default_rng(3)
    q = random_quat(rng, (5,))
    r = quaternion_to_rotation_matrix(q)
    np.testing.assert_allclose(quat_axis(q, axis), r[..., :, axis], atol=1e-5)
