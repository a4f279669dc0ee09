"""RANSAC PnP + motion-only LM tests on synthetic geometry with outliers.

Mirrors the contract of cv::solvePnPRansac + g2o pose BA at
src/frontend.cpp:217-332: recover T_c_w from 3D-2D matches, 4 px inlier
gate, two-round Huber refinement.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu.camera import Camera
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu import camera as cam_mod
from rgbd_visualodometry_tpu.ops import lm, pnp, se3


def make_scene(rng, n=200, outlier_frac=0.3, pix_noise=0.3):
    cam = Camera.from_config(VOConfig())
    T_true = se3.exp(jnp.asarray(rng.uniform(-0.2, 0.2, 6) * np.array([1, 1, 1, 0.5, 0.5, 0.5])))
    # world points in front of the camera
    p_cam = rng.uniform([-2, -1.5, 0.8], [2, 1.5, 5.0], (n, 3))
    p_world = np.asarray(cam_mod.camera2world(jnp.asarray(p_cam, jnp.float32), T_true))
    uv = np.array(cam_mod.camera2pixel(cam, jnp.asarray(p_cam, jnp.float32)))
    uv += rng.normal(0, pix_noise, uv.shape)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(20, 200, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return cam, T_true, jnp.asarray(p_world, jnp.float32), jnp.asarray(uv, jnp.float32), jnp.asarray(p_cam, jnp.float32), out_idx


def pose_error(Ta, Tb):
    d = se3.log(se3.compose(Ta, se3.inverse(Tb)))
    return float(jnp.linalg.norm(d))


def test_ransac_recovers_pose_with_outliers():
    rng = np.random.default_rng(0)
    cam, T_true, p_w, uv, p_cam, out_idx = make_scene(rng)
    n = p_w.shape[0]
    seed = se3.identity()  # poor seed; hypotheses must do the work
    res = pnp.ransac_pnp(
        jax.random.PRNGKey(0), p_w, uv, p_cam, jnp.ones(n, bool), jnp.ones(n, bool),
        seed, cam, n_hypotheses=128, threshold=4.0,
    )
    assert pose_error(res.pose, T_true) < 0.02
    inl = np.asarray(res.inliers)
    assert not inl[out_idx].any() or inl[out_idx].mean() < 0.05
    assert int(res.num_inliers) > 0.6 * n


def test_ransac_seed_lane_wins_when_sampling_is_impossible():
    """With no depth-valid points, only the seed-pose lane can score."""
    rng = np.random.default_rng(1)
    cam, T_true, p_w, uv, p_cam, _ = make_scene(rng, outlier_frac=0.0)
    n = p_w.shape[0]
    res = pnp.ransac_pnp(
        jax.random.PRNGKey(1), p_w, uv, p_cam, jnp.zeros(n, bool), jnp.ones(n, bool),
        T_true, cam, n_hypotheses=32, threshold=4.0,
    )
    assert pose_error(res.pose, T_true) < 1e-5
    assert int(res.num_inliers) == n


def test_pose_jacobian_matches_autodiff():
    """Analytic 2x6 Jacobian (g2o_types.h:86-100 port) vs jax.jacfwd."""
    rng = np.random.default_rng(2)
    cam = Camera.from_config(VOConfig())
    pose = se3.exp(jnp.asarray(rng.uniform(-0.3, 0.3, 6)))
    pts = jnp.asarray(rng.uniform([-2, -2, 1], [2, 2, 5], (7, 3)), jnp.float32)
    uv = jnp.asarray(rng.uniform(0, 400, (7, 2)), jnp.float32)

    def err(delta):
        p = se3.compose(se3.exp(delta), pose)
        e, _ = lm.reprojection_residuals(p, pts, uv, cam)
        return e

    J_auto = jax.jacfwd(err)(jnp.zeros(6))  # [7, 2, 6]
    _, p_c = lm.reprojection_residuals(pose, pts, uv, cam)
    J_analytic = lm.pose_jacobian(p_c, cam)
    np.testing.assert_allclose(np.asarray(J_analytic), np.asarray(J_auto), rtol=1e-4, atol=1e-3)


def test_lm_refines_noisy_pose():
    rng = np.random.default_rng(3)
    cam, T_true, p_w, uv, p_cam, _ = make_scene(rng, outlier_frac=0.0, pix_noise=0.0)
    n = p_w.shape[0]
    T0 = se3.compose(se3.exp(jnp.asarray([0.05, -0.03, 0.02, 0.01, -0.02, 0.015])), T_true)
    assert pose_error(T0, T_true) > 1e-2
    res = lm.refine_pose(T0, p_w, uv, jnp.ones(n, bool), cam)
    assert pose_error(res.pose, T_true) < 1e-4
    assert int(res.num_final_inliers) == n


def test_lm_two_round_outlier_rejection():
    """Outliers must not corrupt the refined pose; final inlier set excludes
    them (mirrors frontend.cpp:293-329)."""
    rng = np.random.default_rng(4)
    cam, T_true, p_w, uv, p_cam, out_idx = make_scene(rng, outlier_frac=0.2, pix_noise=0.1)
    n = p_w.shape[0]
    T0 = se3.compose(se3.exp(jnp.asarray([0.02, 0.01, -0.01, 0.005, 0.01, -0.005])), T_true)
    res = lm.refine_pose(T0, p_w, uv, jnp.ones(n, bool), cam)
    assert pose_error(res.pose, T_true) < 5e-3
    final = np.asarray(res.inliers)
    assert not final[out_idx].any()
    # chi2 <= 1 gate is strict (1 px); with 0.1 px noise most should survive
    assert final.sum() > 0.6 * n


def test_ransac_then_lm_end_to_end():
    """The full EstimatePosePnP equivalent: RANSAC seed -> two-round LM."""
    rng = np.random.default_rng(5)
    cam, T_true, p_w, uv, p_cam, out_idx = make_scene(rng, outlier_frac=0.35, pix_noise=0.2)
    n = p_w.shape[0]
    coarse = pnp.ransac_pnp(
        jax.random.PRNGKey(2), p_w, uv, p_cam, jnp.ones(n, bool), jnp.ones(n, bool),
        se3.identity(), cam,
    )
    fine = lm.refine_pose(coarse.pose, p_w, uv, coarse.inliers, cam)
    assert pose_error(fine.pose, T_true) < 2e-3


def test_depth_free_lanes_recover_pose_without_depth():
    """VERDICT r2 task 4: with ZERO depth-valid matches and a perturbed
    seed, the depth-free 3-point GN lanes must still recover the true pose
    (the reference's P3P never needs depth, src/frontend.cpp:238-241).
    With depth_free_fraction=0 only the (bad) seed lane exists and RANSAC
    cannot do better than it."""
    rng = np.random.default_rng(5)
    cam, T_true, p_w, uv, p_cam, out_idx = make_scene(rng, outlier_frac=0.2)
    n = p_w.shape[0]
    # seed pose well away from the truth (a motion spike / stale pose)
    bad_seed = se3.normalize(
        se3.compose(se3.exp(jnp.asarray([0.15, -0.1, 0.1, 0.04, -0.03, 0.05])), T_true)
    )
    no_depth = jnp.zeros(n, bool)
    # missing depth back-projects to zeros in the pipeline (depth.lookup_depth)
    p_cam = jnp.zeros_like(p_cam)

    res_free = pnp.ransac_pnp(
        jax.random.PRNGKey(2), p_w, uv, p_cam, no_depth, jnp.ones(n, bool),
        bad_seed, cam, n_hypotheses=128, threshold=4.0, depth_free_fraction=0.5,
    )
    assert pose_error(res_free.pose, T_true) < 0.02, (
        f"depth-free lanes failed: err {pose_error(res_free.pose, T_true):.4f}"
    )
    assert int(res_free.num_inliers) > 0.6 * n

    res_none = pnp.ransac_pnp(
        jax.random.PRNGKey(2), p_w, uv, p_cam, no_depth, jnp.ones(n, bool),
        bad_seed, cam, n_hypotheses=128, threshold=4.0, depth_free_fraction=0.0,
    )
    # without depth-free lanes the bad seed is unrecoverable
    assert int(res_none.num_inliers) < int(res_free.num_inliers)
