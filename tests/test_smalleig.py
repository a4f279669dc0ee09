"""Batched Jacobi eigensolver / closed-form small-matrix op tests against
numpy LAPACK oracles."""

import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu.ops import se3, smalleig


def test_jacobi_eigh_4x4_matches_numpy():
    rng = np.random.default_rng(0)
    B = 64
    X = rng.standard_normal((B, 4, 4))
    A = (X + np.transpose(X, (0, 2, 1))).astype(np.float32)
    w, V = smalleig.jacobi_eigh_sym(jnp.asarray(A))
    w_np = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(np.asarray(w), w_np, atol=1e-4)
    # eigenvector property A v = w v
    Av = np.einsum("bij,bjk->bik", A, np.asarray(V))
    wv = np.asarray(w)[:, None, :] * np.asarray(V)
    np.testing.assert_allclose(Av, wv, atol=1e-3)


def test_jacobi_eigh_3x3_psd():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((32, 3, 3)).astype(np.float32)
    A = np.einsum("bij,bkj->bik", X, X)  # PSD
    w, V = smalleig.jacobi_eigh_sym(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(w), np.linalg.eigvalsh(A), rtol=1e-4, atol=1e-4)


def test_inv3x3():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((128, 3, 3)).astype(np.float32) + np.eye(3) * 3
    inv = np.asarray(smalleig.inv3x3(jnp.asarray(A)))
    np.testing.assert_allclose(
        np.einsum("bij,bjk->bik", A, inv),
        np.broadcast_to(np.eye(3), A.shape),
        atol=1e-4,
    )


def test_cholesky_solve():
    rng = np.random.default_rng(6)
    for n in (3, 6):
        X = rng.standard_normal((32, n, n)).astype(np.float32)
        A = np.einsum("bij,bkj->bik", X, X) + np.eye(n, dtype=np.float32) * n
        b = rng.standard_normal((32, n)).astype(np.float32)
        x = np.asarray(smalleig.cholesky_solve(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", A, x), b, atol=1e-3
        )


def test_kabsch_quat_exact():
    rng = np.random.default_rng(3)
    from scipy.spatial.transform import Rotation

    for _ in range(5):
        R = Rotation.random(random_state=rng).as_matrix()
        t = rng.standard_normal(3)
        world = rng.standard_normal((3, 3))  # minimal 3-point sample
        cam = world @ R.T + t
        pose = smalleig.kabsch_quat(
            jnp.asarray(world, jnp.float32), jnp.asarray(cam, jnp.float32)
        )
        got = np.asarray(se3.apply(pose, jnp.asarray(world, jnp.float32)))
        np.testing.assert_allclose(got, cam, atol=1e-4)


def test_kabsch_quat_batched():
    rng = np.random.default_rng(4)
    from scipy.spatial.transform import Rotation

    B = 64
    Rm = Rotation.random(B, random_state=rng).as_matrix()
    t = rng.standard_normal((B, 3))
    world = rng.standard_normal((B, 5, 3)).astype(np.float32)
    cam = np.einsum("bij,bkj->bki", Rm, world) + t[:, None, :]
    poses = smalleig.kabsch_quat(jnp.asarray(world), jnp.asarray(cam, jnp.float32))
    got = np.asarray(se3.apply(poses[:, None, :], jnp.asarray(world)))
    np.testing.assert_allclose(got, cam, atol=2e-4)


def test_kabsch_quat_never_reflects():
    """Near-planar degenerate samples must still give proper rotations."""
    rng = np.random.default_rng(5)
    world = rng.standard_normal((16, 3, 3)).astype(np.float32)
    world[..., 2] = 0.0  # coplanar
    cam = world[:, :, [1, 0, 2]]  # a permutation lookalike target
    poses = smalleig.kabsch_quat(jnp.asarray(world), jnp.asarray(cam))
    R = np.asarray(se3.quat_to_matrix(se3.quat(poses)))
    det = np.linalg.det(R)
    np.testing.assert_allclose(det, 1.0, atol=1e-4)
