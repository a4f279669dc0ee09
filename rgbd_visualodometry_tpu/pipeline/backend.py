"""Local bundle adjustment over the covisible window - the backend.

TPU-native redesign of ``Backend::Optimize`` (``src/backend.cpp:19-195``),
which the reference runs on its own thread with g2o LM + CSparse Schur.
Here the whole solve is one jitted program over fixed-capacity arrays:

- **Window**: the current keyframe + its active covisible keyframes
  (``backend.cpp:36-38``), capped at ``ba_max_poses`` by covisibility weight.
  Keyframe slot 0 is held fixed (``backend.cpp:55``); keyframes outside the
  window that observe window mappoints act as fixed poses
  (``backend.cpp:108-120``) - instead of materializing extra vertices, their
  edges simply carry a zero pose-Jacobian.
- **Points**: non-outlier mappoints observed by window keyframes
  (``backend.cpp:62-81``), marginalized via the explicit Schur complement:
  per-point 3x3 blocks are inverted in batch and the reduced (P*6)^2 camera
  system is solved densely - P is small, so the MXU eats it.
- **Robustification**: Huber delta = sqrt(7.815) (``backend.cpp:84``),
  two rounds of 10 LM iterations with chi2 > chi2_th pruning in between;
  pruned observations are *removed from the map* and zero-observation
  mappoints become outliers (``backend.cpp:139-172`` ->
  ``Frame::RemoveObservedMappoint`` -> ``Mappoint::RemoveObservedByKeyframe``).
- **Write-back**: window keyframe poses and non-outlier point positions
  (``backend.cpp:182-194``); touched points get ``optimized_ = true``.

The reference's "latest keyframe wins" condvar trigger (``backend.h:33-37``)
is preserved at the system level: the host dispatches this step after each
keyframe; XLA's async dispatch queue plays the role of the backend thread.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rgbd_visualodometry_tpu import camera as cam_mod
from rgbd_visualodometry_tpu import mapstate
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.mapstate import VOState
from rgbd_visualodometry_tpu.ops import lm as lm_ops
from rgbd_visualodometry_tpu.ops import packing, se3


class _BAProblem(NamedTuple):
    # window poses
    widx: jnp.ndarray  # [P] keyframe slots in the window
    wval: jnp.ndarray  # [P] bool
    wfixed: jnp.ndarray  # [P] bool - held constant (slot 0)
    # points
    pidx: jnp.ndarray  # [MB] mappoint slots
    pval: jnp.ndarray  # [MB] bool
    # edges
    e_p: jnp.ndarray  # [E] index into packed points
    e_w: jnp.ndarray  # [E] index into window poses (0 if fixed-outside)
    e_kf: jnp.ndarray  # [E] raw keyframe slot (for fixed-pose gather)
    e_slot: jnp.ndarray  # [E] observation slot (for map pruning write-back)
    e_uv: jnp.ndarray  # [E, 2] measured pixel
    e_depth: jnp.ndarray  # [E] measured sensor depth in meters (0 = none)
    e_pose_free: jnp.ndarray  # [E] bool - pose Jacobian active
    e_valid: jnp.ndarray  # [E] bool


def build_problem(cfg: VOConfig, state: VOState, kf: jnp.ndarray) -> _BAProblem:
    K = state.kf_pose.shape[0]
    C, M = state.obs_kf.shape
    P, MB, E = cfg.ba_max_poses, cfg.ba_max_points, cfg.ba_max_edges

    A = mapstate.incidence(state)
    row = jax.lax.dot_general(
        A[kf].astype(jnp.int32), A.astype(jnp.int32),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [K] shared-observation counts with kf
    in_window = ((row >= cfg.covisibility_weight_threshold) | (jnp.arange(K) == kf)) & state.kf_valid
    # top-P by weight, with the current keyframe always included
    weight = jnp.where(in_window, row + 1, -1)
    weight = weight.at[kf].set(
        jnp.where(state.kf_valid[kf], jnp.iinfo(jnp.int32).max, -1)
    )
    wweight, widx = jax.lax.top_k(weight, P)
    wval = wweight > 0
    wfixed = (widx == 0) & wval  # KF id 0 fixed (backend.cpp:55)

    # window-membership lookup: kf slot -> window position (or -1)
    wpos = jnp.full(K, -1, jnp.int32).at[jnp.where(wval, widx, K)].set(
        jnp.arange(P, dtype=jnp.int32), mode="drop"
    )

    # points observed by the window
    win_kf_mask = jnp.zeros(K, bool).at[jnp.where(wval, widx, K)].set(True, mode="drop")
    observed = (
        jax.lax.dot_general(
            win_kf_mask.astype(jnp.int32), A.astype(jnp.int32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        > 0
    )
    pmask = observed & state.mp_alive
    pidx, pval = packing.compact_indices(pmask, MB)

    # edges: every valid observation of a selected point
    obs_kf = jnp.take(state.obs_kf, pidx, axis=0)  # [MB, M]
    obs_ok = jnp.take(state.obs_valid, pidx, axis=0) & pval[:, None]
    e_mask = obs_ok.reshape(-1)  # [MB*M]
    eidx, e_valid = packing.compact_indices(e_mask, E)
    e_p = (eidx // M).astype(jnp.int32)
    e_slot = (eidx % M).astype(jnp.int32)
    e_kf = obs_kf.reshape(-1)[eidx]
    e_kf_safe = jnp.clip(e_kf, 0, K - 1)
    e_wpos = wpos[e_kf_safe]
    e_in_window = (e_wpos >= 0) & e_valid
    e_w = jnp.where(e_in_window, e_wpos, 0)
    e_fixed_slot0 = jnp.take(wfixed, e_w)
    e_pose_free = e_in_window & ~e_fixed_slot0
    e_uv = jnp.take(state.obs_uv, pidx, axis=0).reshape(-1, 2)[eidx]
    e_depth = jnp.take(state.obs_depth, pidx, axis=0).reshape(-1)[eidx]

    return _BAProblem(
        widx=widx, wval=wval, wfixed=wfixed,
        pidx=pidx, pval=pval,
        e_p=e_p, e_w=e_w, e_kf=e_kf_safe, e_slot=e_slot, e_uv=e_uv,
        e_depth=e_depth, e_pose_free=e_pose_free, e_valid=e_valid,
    )


def _edge_residuals(prob, poses_w, pts, fixed_poses, camera):
    """Residuals + camera-frame points for every edge.

    poses_w: [P, 7] current window pose estimates; fixed_poses: [E, 7]
    poses gathered from the (constant) map for out-of-window observers.
    """
    # free-pose edges read the evolving window estimates; fixed poses (slot 0
    # or out-of-window observers) read the frozen map poses - slot 0 never
    # moves in the window either, so the two sources agree for it
    e_pose = jnp.where(
        prob.e_pose_free[:, None], jnp.take(poses_w, prob.e_w, axis=0), fixed_poses
    )
    p_w = jnp.take(pts, prob.e_p, axis=0)
    p_c = se3.apply(e_pose, p_w)
    proj = cam_mod.camera2pixel(camera, p_c)
    return prob.e_uv - proj, p_c, e_pose


def _chi2(prob, poses_w, pts, fixed_poses, camera):
    e, _, _ = _edge_residuals(prob, poses_w, pts, fixed_poses, camera)
    return jnp.sum(e * e, axis=-1)


class _IterState(NamedTuple):
    poses: jnp.ndarray  # [P, 7]
    pts: jnp.ndarray  # [MB, 3]
    lam: jnp.ndarray
    cost: jnp.ndarray


def _lm_rounds(cfg, camera, prob, poses0, pts0, fixed_poses, edge_mask, iterations, huber_delta):
    """One LM phase (``optimizer.optimize(10)``) with adaptive damping."""
    P = poses0.shape[0]
    MB = pts0.shape[0]
    maskf = edge_mask.astype(jnp.float32)

    # depth-prior information: pixel-equivalent weighting (fx/z)^2 so the
    # sensor-depth residual (meters) lives on the same chi2 scale as the
    # 2D reprojection residual (pixels); see VOConfig.ba_use_depth_prior
    if cfg.ba_use_depth_prior:
        w_depth = (
            (prob.e_depth > 0).astype(jnp.float32)
            * cfg.ba_depth_weight
            * (camera.fx / jnp.maximum(prob.e_depth, 0.25)) ** 2
        )
    else:
        w_depth = jnp.zeros_like(prob.e_depth)

    def depth_residual(poses, pts):
        _, p_c, _ = _edge_residuals(prob, poses, pts, fixed_poses, camera)
        return prob.e_depth - p_c[..., 2]

    def total_cost(poses, pts):
        c2 = _chi2(prob, poses, pts, fixed_poses, camera)
        rd = depth_residual(poses, pts)
        return jnp.sum(
            maskf * (lm_ops._robust_cost(c2, huber_delta) + w_depth * rd * rd)
        )

    seg_pw = prob.e_p * P + prob.e_w  # combined (point, window-pose) segment

    def body(_, st: _IterState) -> _IterState:
        e, p_c, e_pose = _edge_residuals(prob, st.poses, st.pts, fixed_poses, camera)
        Jp = lm_ops.pose_jacobian(p_c, camera)  # [E, 2, 6]
        R = se3.quat_to_matrix(se3.quat(e_pose))  # [E, 3, 3]
        Jl = jnp.einsum("eki,eij->ekj", Jp[:, :, :3], R)  # [E, 2, 3] (g2o_types.h:172)
        w = maskf * lm_ops._huber_weights(jnp.sum(e * e, axis=-1), huber_delta)
        wp = w * prob.e_pose_free.astype(jnp.float32)

        # depth-prior terms: residual r_d = d_meas - z_cam with
        # dz/ddelta = [0,0,1, y,-x, 0] (left-mult update), dz/dp_w = R.row(2)
        X, Y, Z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
        zeros = jnp.zeros_like(X)
        ones = jnp.ones_like(X)
        Jd_pose = -jnp.stack([zeros, zeros, ones, Y, -X, zeros], axis=-1)  # [E, 6]
        Jd_pt = -R[:, 2, :]  # [E, 3]
        r_d = prob.e_depth - Z
        wd = maskf * w_depth
        wdp = wd * prob.e_pose_free.astype(jnp.float32)

        # block accumulations (reprojection + depth-prior terms fused)
        U = jnp.zeros((P, 6, 6), jnp.float32).at[prob.e_w].add(
            wp[:, None, None] * jnp.einsum("eki,ekj->eij", Jp, Jp)
            + wdp[:, None, None] * jnp.einsum("ei,ej->eij", Jd_pose, Jd_pose)
        )
        gp = jnp.zeros((P, 6), jnp.float32).at[prob.e_w].add(
            wp[:, None] * jnp.einsum("eki,ek->ei", Jp, e)
            + wdp[:, None] * Jd_pose * r_d[:, None]
        )
        V = jnp.zeros((MB, 3, 3), jnp.float32).at[prob.e_p].add(
            w[:, None, None] * jnp.einsum("eki,ekj->eij", Jl, Jl)
            + wd[:, None, None] * jnp.einsum("ei,ej->eij", Jd_pt, Jd_pt)
        )
        gl = jnp.zeros((MB, 3), jnp.float32).at[prob.e_p].add(
            w[:, None] * jnp.einsum("eki,ek->ei", Jl, e)
            + wd[:, None] * Jd_pt * r_d[:, None]
        )
        Wt = jnp.zeros((MB * P, 6, 3), jnp.float32).at[seg_pw].add(
            wp[:, None, None] * jnp.einsum("eki,ekj->eij", Jp, Jl)
            + wdp[:, None, None] * jnp.einsum("ei,ej->eij", Jd_pose, Jd_pt)
        ).reshape(MB, P, 6, 3)

        lam = st.lam
        Ud = U + lam * jnp.eye(6, dtype=jnp.float32)[None]
        Vd = V + lam * jnp.eye(3, dtype=jnp.float32)[None]
        Vinv = jnp.linalg.inv(Vd)
        Y = jnp.einsum("pial,plk->piak", Wt, Vinv)  # [MB, P, 6, 3]

        S = -jnp.einsum("piak,pjbk->iajb", Y, Wt)  # [P, 6, P, 6]
        diag = jnp.arange(P)
        S = S.at[diag, :, diag, :].add(Ud)
        rhs = -(gp - jnp.einsum("piak,pk->ia", Y, gl))  # [P, 6]

        # freeze fixed / invalid poses: identity rows, zero rhs
        free_pose = (~prob.wfixed) & prob.wval
        fm = free_pose.astype(jnp.float32)
        S = S * fm[:, None, None, None] * fm[None, None, :, None]
        S = S.at[diag, :, diag, :].add(
            jnp.eye(6, dtype=jnp.float32)[None] * (1.0 - fm)[:, None, None]
        )
        rhs = rhs * fm[:, None]

        dp = jnp.linalg.solve(S.reshape(P * 6, P * 6), rhs.reshape(P * 6)).reshape(P, 6)
        dl = jnp.einsum("pij,pj->pi", Vinv, -gl - jnp.einsum("piak,ia->pk", Wt, dp))

        cand_poses = se3.normalize(se3.compose(se3.exp(dp), st.poses))
        cand_poses = jnp.where(free_pose[:, None], cand_poses, st.poses)
        cand_pts = jnp.where(prob.pval[:, None], st.pts + dl, st.pts)
        new_cost = total_cost(cand_poses, cand_pts)
        accept = new_cost < st.cost
        return _IterState(
            poses=jnp.where(accept, cand_poses, st.poses),
            pts=jnp.where(accept, cand_pts, st.pts),
            lam=jnp.where(accept, lam * 0.33, lam * 5.0),
            cost=jnp.where(accept, new_cost, st.cost),
        )

    init = _IterState(
        poses=poses0, pts=pts0, lam=jnp.asarray(1e-3, jnp.float32),
        cost=total_cost(poses0, pts0),
    )
    st = jax.lax.fori_loop(0, iterations, body, init)
    return st.poses, st.pts


class BAOutput(NamedTuple):
    num_pruned: jnp.ndarray  # outlier observations removed (both passes)
    num_points: jnp.ndarray
    num_poses: jnp.ndarray


def ba_step(cfg: VOConfig, camera, state: VOState, kf: jnp.ndarray):
    """Full two-round local BA on keyframe ``kf``; returns (state, BAOutput).

    Masked no-op when the window/point sets are empty.
    """
    C, M = state.obs_kf.shape
    prob = build_problem(cfg, state, kf)

    poses0 = jnp.take(state.kf_pose, prob.widx, axis=0)
    pts0 = jnp.take(state.mp_pos, prob.pidx, axis=0)
    fixed_poses = jnp.take(state.kf_pose, prob.e_kf, axis=0)

    # round 1: robust kernel on all edges (backend.cpp:122-141)
    poses1, pts1 = _lm_rounds(
        cfg, camera, prob, poses0, pts0, fixed_poses, prob.e_valid,
        cfg.ba_iterations, cfg.huber_delta,
    )
    chi2_1 = _chi2(prob, poses1, pts1, fixed_poses, camera)
    prune1 = prob.e_valid & (chi2_1 > cfg.chi2_th)

    # round 2: no robust kernel, pruned edges out (backend.cpp:143-159)
    mask2 = prob.e_valid & ~prune1
    poses2, pts2 = _lm_rounds(
        cfg, camera, prob, poses1, pts1, fixed_poses, mask2,
        cfg.ba_iterations, None,
    )
    chi2_2 = _chi2(prob, poses2, pts2, fixed_poses, camera)
    prune2 = mask2 & (chi2_2 > cfg.chi2_th)
    pruned = prune1 | prune2

    # ---- write back ------------------------------------------------------
    # poses of window keyframes (incl. the fixed one - unchanged anyway)
    wtgt = jnp.where(prob.wval & ~prob.wfixed, prob.widx, state.kf_pose.shape[0])
    kf_pose = state.kf_pose.at[wtgt].set(poses2, mode="drop")

    # positions of selected, still-non-outlier points + optimized_ flag
    pt_ok = prob.pval & ~jnp.take(state.mp_outlier, prob.pidx)
    ptgt = jnp.where(pt_ok, prob.pidx, C)
    mp_pos = state.mp_pos.at[ptgt].set(pts2, mode="drop")
    mp_opt = state.mp_optimized.at[ptgt].set(True, mode="drop")

    state = state._replace(kf_pose=kf_pose, mp_pos=mp_pos, mp_optimized=mp_opt)

    # remove pruned observations from the map (backend.cpp:148-153, 164-168)
    rm_flat_idx = jnp.where(pruned, jnp.take(prob.pidx, prob.e_p) * M + prob.e_slot, C * M)
    rm_mask = jnp.zeros(C * M, bool).at[rm_flat_idx].set(True, mode="drop").reshape(C, M)
    state = mapstate.remove_observations(state, rm_mask)

    out = BAOutput(
        num_pruned=jnp.sum(pruned).astype(jnp.int32),
        num_points=jnp.sum(prob.pval).astype(jnp.int32),
        num_poses=jnp.sum(prob.wval).astype(jnp.int32),
    )
    return state, out
