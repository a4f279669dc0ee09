"""Property tests for the SE(3) module against scipy/numpy oracles.

Covers the semantics the reference relies on from Sophus
(``include/myslam/g2o_types.h:44-66``): translation-first tangent ordering,
left-multiplicative retraction, exp/log round trips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from rgbd_visualodometry_tpu.ops import se3

jax.config.update("jax_enable_x64", True)


def random_pose(rng, n=()):
    q = ScipyRot.random(int(np.prod(n)) if n else 1, random_state=rng).as_quat()
    # scipy gives xyzw; convert to wxyz
    q = np.concatenate([q[:, 3:4], q[:, :3]], axis=1)
    t = rng.standard_normal((q.shape[0], 3))
    T = np.concatenate([q, t], axis=1)
    return jnp.asarray(T.reshape(n + (7,)) if n else T[0], dtype=jnp.float64)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.uniform(-1.5, 1.5, (64, 6)))
    back = se3.log(se3.exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-9)


def test_log_exp_roundtrip_poses():
    rng = np.random.default_rng(1)
    T = random_pose(rng, (32,))
    T2 = se3.exp(se3.log(T))
    # same transform: compare action on points (quaternion sign may flip)
    p = jnp.asarray(rng.standard_normal((32, 3)))
    np.testing.assert_allclose(
        np.asarray(se3.apply(T, p)), np.asarray(se3.apply(T2, p)), atol=1e-9
    )


def test_exp_small_angle():
    xi = jnp.asarray([[1e-9, -2e-9, 3e-9, 1e-10, -1e-10, 2e-10], [0.0] * 6])
    T = se3.exp(xi)
    np.testing.assert_allclose(np.asarray(T[1]), [1, 0, 0, 0, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(se3.trans(T[0])), xi[0, :3], atol=1e-15)


def test_compose_inverse_identity():
    rng = np.random.default_rng(2)
    T = random_pose(rng, (16,))
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(se3.trans(I)), 0, atol=1e-9)
    np.testing.assert_allclose(np.abs(np.asarray(se3.quat(I)[:, 0])), 1, atol=1e-9)


def test_apply_matches_matrix():
    rng = np.random.default_rng(3)
    T = random_pose(rng, (8,))
    p = jnp.asarray(rng.standard_normal((8, 3)))
    M = se3.to_matrix(T)
    expected = np.einsum("nij,nj->ni", np.asarray(M[:, :3, :3]), np.asarray(p)) + np.asarray(
        M[:, :3, 3]
    )
    np.testing.assert_allclose(np.asarray(se3.apply(T, p)), expected, atol=1e-9)


def test_matrix_quat_roundtrip():
    rng = np.random.default_rng(4)
    T = random_pose(rng, (64,))
    T2 = se3.from_matrix(se3.to_matrix(T))
    p = jnp.asarray(rng.standard_normal((64, 3)))
    np.testing.assert_allclose(
        np.asarray(se3.apply(T2, p)), np.asarray(se3.apply(T, p)), atol=1e-8
    )


def test_matrix_quat_roundtrip_near_pi():
    """Near-pi rotations exercise the non-trace branches of matrix_to_quat."""
    for axis in ([1, 0, 0], [0, 1, 0], [0, 0, 1], [0.6, -0.8, 0]):
        R = ScipyRot.from_rotvec(np.asarray(axis, float) * 3.14).as_matrix()
        q = se3.matrix_to_quat(jnp.asarray(R))
        R2 = se3.quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-7)


def test_tangent_ordering_translation_first():
    """g2o_types.h:44-45: first 3 of translation, last 3 of rotation."""
    xi = jnp.asarray([0.1, 0.2, 0.3, 0.0, 0.0, 0.0])
    T = se3.exp(xi)
    np.testing.assert_allclose(np.asarray(se3.trans(T)), [0.1, 0.2, 0.3], atol=1e-12)
    np.testing.assert_allclose(np.asarray(se3.quat(T)), [1, 0, 0, 0], atol=1e-12)


def test_log_matches_scipy_rotvec():
    rng = np.random.default_rng(5)
    rv = rng.uniform(-2, 2, (16, 3))
    q_scipy = ScipyRot.from_rotvec(rv).as_quat()  # xyzw
    q = jnp.asarray(np.concatenate([q_scipy[:, 3:4], q_scipy[:, :3]], axis=1))
    np.testing.assert_allclose(np.asarray(se3.so3_log(q)), rv, atol=1e-9)


def test_left_multiplicative_update():
    """Retraction used by both BA solvers: exp(delta) * T (g2o_types.h:59)."""
    rng = np.random.default_rng(6)
    T = random_pose(rng)
    delta = jnp.asarray(rng.uniform(-0.1, 0.1, (6,)))
    updated = se3.compose(se3.exp(delta), T)
    M = np.asarray(se3.to_matrix(se3.exp(delta))) @ np.asarray(se3.to_matrix(T))
    p = jnp.asarray(rng.standard_normal((3,)))
    np.testing.assert_allclose(
        np.asarray(se3.apply(updated, p)),
        (M[:3, :3] @ np.asarray(p) + M[:3, 3]),
        atol=1e-9,
    )


def test_relative_motion_norm_thresholds():
    """IsKeyframe splits d=log(T_r_c) into trans=head<3>, rot=tail<3>
    (src/frontend.cpp:353-364)."""
    prev = se3.identity(jnp.float64)
    curr = se3.exp(jnp.asarray([0.0, 0.0, 0.06, 0.0, 0.0, 0.0]))  # 6 cm dz
    d = se3.log(se3.relative(prev, curr))
    trans_norm = jnp.linalg.norm(d[:3])
    rot_norm = jnp.linalg.norm(d[3:])
    assert float(trans_norm) == pytest.approx(0.06, abs=1e-9)
    assert float(rot_norm) == pytest.approx(0.0, abs=1e-9)


def test_vmap_and_jit():
    rng = np.random.default_rng(7)
    T = random_pose(rng, (4, 5))
    out = jax.jit(se3.log)(T)
    assert out.shape == (4, 5, 6)
