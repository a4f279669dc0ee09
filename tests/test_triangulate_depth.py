"""Triangulation (util.h:16-34 semantics) and depth lookup
(frame.cpp:43-67 semantics) tests."""

import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu.camera import Camera
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu import camera as cam_mod
from rgbd_visualodometry_tpu.ops import depth as depth_mod
from rgbd_visualodometry_tpu.ops import se3, triangulate


def test_triangulate_recovers_points():
    rng = np.random.default_rng(0)
    B, K = 32, 4
    pts_true = rng.uniform([-2, -2, 2], [2, 2, 6], (B, 3)).astype(np.float32)
    poses = []
    for k in range(K):
        poses.append(se3.exp(jnp.asarray([0.3 * k, 0.05 * k, 0.0, 0.0, 0.02 * k, 0.0])))
    poses = jnp.stack(poses)  # [K, 7]
    poses_b = jnp.broadcast_to(poses[None], (B, K, 7))
    p_cam = se3.apply(poses_b, jnp.asarray(pts_true)[:, None, :])
    norm_xy = p_cam[..., :2] / p_cam[..., 2:3]
    mask = jnp.ones((B, K), bool)

    res = triangulate.triangulate(poses_b, norm_xy, mask)
    assert bool(res.ok.all())
    np.testing.assert_allclose(np.asarray(res.points), pts_true, atol=1e-3)


def test_triangulate_respects_mask_and_min_obs():
    rng = np.random.default_rng(1)
    B, K = 8, 4
    pts_true = rng.uniform([-1, -1, 2], [1, 1, 5], (B, 3)).astype(np.float32)
    poses = jnp.stack(
        [se3.exp(jnp.asarray([0.4 * k, 0.0, 0.0, 0.0, 0.0, 0.0])) for k in range(K)]
    )
    poses_b = jnp.broadcast_to(poses[None], (B, K, 7))
    p_cam = se3.apply(poses_b, jnp.asarray(pts_true)[:, None, :])
    norm_xy = p_cam[..., :2] / p_cam[..., 2:3]
    mask = jnp.ones((B, K), bool).at[0, 1:].set(False)  # point 0: single obs
    res = triangulate.triangulate(poses_b, norm_xy, mask)
    assert not bool(res.ok[0])
    assert bool(res.ok[1:].all())
    # masked observations are genuinely ignored: corrupt them for point 1
    norm_bad = norm_xy.at[1, 2:].set(99.0)
    mask2 = mask.at[1, 2:].set(False)
    res2 = triangulate.triangulate(poses_b, norm_bad, mask2)
    assert bool(res2.ok[1])
    np.testing.assert_allclose(np.asarray(res2.points[1]), pts_true[1], atol=1e-3)


def test_triangulate_degenerate_baseline_fails_gate():
    """Identical poses -> no baseline -> the sigma ratio gate must reject
    (util.h:30-33)."""
    B, K = 4, 3
    pose = se3.identity()
    poses_b = jnp.broadcast_to(pose[None, None], (B, K, 7))
    rng = np.random.default_rng(2)
    pts = rng.uniform([-1, -1, 2], [1, 1, 5], (B, 3)).astype(np.float32)
    p_cam = se3.apply(poses_b, jnp.asarray(pts)[:, None, :])
    norm_xy = p_cam[..., :2] / p_cam[..., 2:3]
    res = triangulate.triangulate(poses_b, norm_xy, jnp.ones((B, K), bool))
    assert not bool(res.ok.any())


def test_triangulate_min_baseline_gate():
    """Observer spans below ``min_baseline`` are rejected even when the
    sigma-ratio gate passes: keyframes one 0.05 m keyframe-threshold apart
    triangulate with ~8 cm depth noise at fr1 depths, far worse than the
    depth-derived position the refinement would overwrite."""
    rng = np.random.default_rng(3)
    B, K = 8, 3
    pts = rng.uniform([-1, -1, 2], [1, 1, 5], (B, 3)).astype(np.float32)
    # camera centers 0.05 m apart (keyframe threshold), then one 0.5 m away
    near = jnp.stack(
        [se3.exp(jnp.asarray([0.05 * k, 0.0, 0.0, 0.0, 0.0, 0.0])) for k in range(K)]
    )
    wide = jnp.stack(
        [se3.exp(jnp.asarray([0.5 * k, 0.0, 0.0, 0.0, 0.0, 0.0])) for k in range(K)]
    )
    for poses, span in ((near, 0.05 * (K - 1)), (wide, 0.5 * (K - 1))):
        poses_b = jnp.broadcast_to(poses[None], (B, K, 7))
        p_cam = se3.apply(poses_b, jnp.asarray(pts)[:, None, :])
        norm_xy = p_cam[..., :2] / p_cam[..., 2:3]
        mask = jnp.ones((B, K), bool)
        ungated = triangulate.triangulate(poses_b, norm_xy, mask)
        gated = triangulate.triangulate(poses_b, norm_xy, mask, min_baseline=0.4)
        assert bool(ungated.ok.all())  # sigma gate alone accepts both
        assert bool(gated.ok.all()) == (span >= 0.4)
    # the gate only looks at VALID observers: a wide pose hidden by the mask
    # must not unlock a narrow pair
    mixed = jnp.concatenate([near[:2], wide[2:3]])  # centers 0, 0.05, 1.0
    poses_b = jnp.broadcast_to(mixed[None], (B, K, 7))
    p_cam = se3.apply(poses_b, jnp.asarray(pts)[:, None, :])
    norm_xy = p_cam[..., :2] / p_cam[..., 2:3]
    mask = jnp.ones((B, K), bool).at[:, 2].set(False)
    gated = triangulate.triangulate(poses_b, norm_xy, mask, min_baseline=0.4)
    assert not bool(gated.ok.any())


def test_depth_lookup_center_and_fallback():
    depth_img = np.zeros((10, 12), np.uint16)
    depth_img[5, 6] = 5000  # 1.0 m at (x=6, y=5)
    depth_img[2, 3] = 0  # hole at (3, 2) ...
    depth_img[2, 2] = 10000  # ... with left neighbor (dx=-1) = 2.0 m
    depth_img[8, 8] = 0  # hole with no neighbors

    xy = jnp.asarray([[6.2, 4.9], [3.0, 2.0], [8.0, 8.0]], jnp.float32)
    res = depth_mod.lookup_depth(jnp.asarray(depth_img), xy, jnp.float32(5000.0))
    assert list(np.asarray(res.valid)) == [True, True, False]
    np.testing.assert_allclose(np.asarray(res.depth)[:2], [1.0, 2.0])
    assert float(res.depth[2]) == 0.0


def test_depth_lookup_clamps_border():
    depth_img = np.full((5, 5), 2500, np.uint16)
    xy = jnp.asarray([[-3.0, -3.0], [10.0, 10.0]], jnp.float32)
    res = depth_mod.lookup_depth(jnp.asarray(depth_img), xy, jnp.float32(5000.0))
    assert list(np.asarray(res.valid)) == [True, True]
    np.testing.assert_allclose(np.asarray(res.depth), [0.5, 0.5])


def test_backprojection_consistency():
    """pixel + depth -> camera -> pixel roundtrip through the camera module
    (the CreateNewMappoints path, frontend.cpp:372-406)."""
    cam = Camera.from_config(VOConfig())
    depth_img = np.full((480, 640), 7500, np.uint16)  # 1.5 m everywhere
    xy = jnp.asarray([[100.4, 200.2], [320.0, 240.0]], jnp.float32)
    d = depth_mod.lookup_depth(jnp.asarray(depth_img), xy, cam.depth_scale)
    p_c = cam_mod.pixel2camera(cam, xy, d.depth)
    np.testing.assert_allclose(np.asarray(p_c[:, 2]), [1.5, 1.5])
    uv2 = cam_mod.camera2pixel(cam, p_c)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(xy), atol=1e-4)
