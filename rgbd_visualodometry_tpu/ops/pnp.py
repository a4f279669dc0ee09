"""Lane-parallel RANSAC pose estimation for RGB-D 3D-2D correspondences.

TPU-native replacement for ``cv::solvePnPRansac(..., 100 iters, 4.0 px,
0.99 conf, SOLVEPNP_P3P, useExtrinsicGuess=true)`` at
``src/frontend.cpp:233-242``.  Instead of OpenCV's sequential
hypothesize-and-test loop, all hypotheses are generated and scored at once:

- Each RANSAC lane samples a 3-point minimal set and solves a closed-form
  **Kabsch 3D-3D alignment** between the matched mappoints (world frame) and
  the same keypoints back-projected through the current *depth image*
  (camera frame).  For an RGB-D sensor this minimal solver is available
  "for free" (the reference's P3P never uses the depth channel for pose
  hypotheses) and is branch-free - a batched 3x3 SVD - which suits the TPU
  far better than P3P's quartic root-finding.
- Lane 0 is always the previous pose, reproducing the reference's
  ``useExtrinsicGuess=true`` seeding.
- Scoring reproduces the reference contract: a correspondence is an inlier
  iff its **2D reprojection error** is below 4 px; the best lane maximizes
  the inlier count.

The polished pose then comes from the two-round Huber LM in
:mod:`rgbd_visualodometry_tpu.ops.lm`, mirroring the g2o motion-only BA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rgbd_visualodometry_tpu import camera as cam_mod
from rgbd_visualodometry_tpu.ops import se3


class RansacResult(NamedTuple):
    pose: jnp.ndarray  # [7] best T_c_w
    inliers: jnp.ndarray  # [M] bool (reprojection < threshold under best pose)
    num_inliers: jnp.ndarray  # scalar int32 (the reference's numInliers_)


# Closed-form rigid alignment (Horn quaternion method, batched Jacobi
# eigensolver - no SVD, compiles to fused elementwise ops on TPU).
from rgbd_visualodometry_tpu.ops.smalleig import kabsch_quat as _kabsch  # noqa: E402


def ransac_pnp(
    key: jax.Array,
    p_world: jnp.ndarray,  # [M, 3] matched mappoint positions (world)
    uv: jnp.ndarray,  # [M, 2] matched keypoint pixels
    p_cam_depth: jnp.ndarray,  # [M, 3] keypoints back-projected via depth
    depth_ok: jnp.ndarray,  # [M] bool - depth was valid at the keypoint
    match_valid: jnp.ndarray,  # [M] bool - slot holds a real match
    seed_pose: jnp.ndarray,  # [7] previous pose T_c_w (extrinsic guess)
    camera: cam_mod.Camera,
    n_hypotheses: int = 128,
    threshold: float = 4.0,
) -> RansacResult:
    """Vectorized RANSAC over ``n_hypotheses`` lanes (+1 seed lane)."""
    m = p_world.shape[0]
    sample_ok = match_valid & depth_ok

    # --- sample 3 distinct valid indices per lane -------------------------
    noise = jax.random.uniform(key, (n_hypotheses, m))
    scores = jnp.where(sample_ok[None, :], noise, -1.0)
    _, sample_idx = jax.lax.top_k(scores, 3)  # [H, 3]

    # --- closed-form hypothesis per lane ----------------------------------
    w3 = jnp.take(p_world, sample_idx, axis=0)  # [H, 3, 3]
    c3 = jnp.take(p_cam_depth, sample_idx, axis=0)
    hyp = _kabsch(w3, c3)  # [H, 7] (batched closed form)
    hyp = jnp.nan_to_num(hyp)
    hyp = jnp.concatenate([seed_pose[None], hyp], axis=0)  # [H+1, 7]

    # --- score every lane against every correspondence --------------------
    proj = cam_mod.world2pixel(camera, p_world[None, :, :], hyp[:, None, :])
    z = cam_mod.world2camera(p_world[None, :, :], hyp[:, None, :])[..., 2]
    err2 = jnp.sum((proj - uv[None, :, :]) ** 2, axis=-1)  # [H+1, M]
    is_in = match_valid[None, :] & (z > 0) & (err2 < threshold * threshold)
    counts = jnp.sum(is_in, axis=1)  # [H+1]
    best = jnp.argmax(counts)

    return RansacResult(
        pose=se3.normalize(hyp[best]),
        inliers=is_in[best],
        num_inliers=counts[best].astype(jnp.int32),
    )
