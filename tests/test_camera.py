"""Camera transform family tests (oracle: direct numpy formulas).

Semantics from ``src/camera.cpp:41-86`` and the frustum/angle check from
``src/frame.cpp:70-91``.
"""

import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu import camera as cam_mod
from rgbd_visualodometry_tpu.camera import Camera
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.ops import se3


def fr1_camera():
    return Camera.from_config(VOConfig())


def test_camera_matrix():
    cam = fr1_camera()
    K = np.asarray(cam.matrix)
    np.testing.assert_allclose(
        K, [[517.3, 0, 318.6], [0, 516.5, 255.3], [0, 0, 1]], rtol=1e-6
    )


def test_pixel_camera_roundtrip():
    cam = fr1_camera()
    uv = jnp.asarray([[10.0, 20.0], [320.0, 240.0], [639.0, 479.0]])
    depth = jnp.asarray([0.5, 2.0, 4.0])
    p_c = cam_mod.pixel2camera(cam, uv, depth)
    np.testing.assert_allclose(np.asarray(p_c[:, 2]), np.asarray(depth), rtol=1e-6)
    uv2 = cam_mod.camera2pixel(cam, p_c)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), rtol=1e-5)


def test_world_pixel_roundtrip_with_pose():
    rng = np.random.default_rng(0)
    cam = fr1_camera()
    T = se3.exp(jnp.asarray(rng.uniform(-0.3, 0.3, (6,))))
    uv = jnp.asarray(rng.uniform([0, 0], [640, 480], (50, 2)))
    depth = jnp.asarray(rng.uniform(0.5, 5.0, (50,)))
    p_w = cam_mod.pixel2world(cam, uv, T, depth)
    uv2 = cam_mod.world2pixel(cam, p_w, T)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)


def test_camera_center():
    T = se3.exp(jnp.asarray([1.0, 2.0, 3.0, 0.1, 0.2, 0.3]))
    c = cam_mod.camera_center(T)
    # center = -R^T t
    M = np.asarray(se3.to_matrix(T))
    np.testing.assert_allclose(np.asarray(c), -M[:3, :3].T @ M[:3, 3], atol=1e-6)


def test_in_frustum_basic():
    cam = fr1_camera()
    T = se3.identity()
    pts = jnp.asarray(
        [
            [0.0, 0.0, 2.0],  # straight ahead -> visible
            [0.0, 0.0, -2.0],  # behind camera
            [100.0, 0.0, 1.0],  # projects far out of image
        ]
    )
    mask = cam_mod.in_frustum(cam, pts, T)
    assert list(np.asarray(mask)) == [True, False, False]


def test_in_frustum_angle_gate():
    """Viewing-direction gate: angle > pi/6 rejects (frame.cpp:86-89)."""
    cam = fr1_camera()
    T = se3.identity()
    p = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 2.0]])
    # first normal aligned with viewing ray (+z), second nearly orthogonal
    norms = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.05]])
    norms = norms / jnp.linalg.norm(norms, axis=-1, keepdims=True)
    mask = cam_mod.in_frustum(cam, p, T, mp_norm=norms)
    assert list(np.asarray(mask)) == [True, False]
