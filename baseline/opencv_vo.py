"""Measured-baseline twin: the reference RGB-D VO pipeline in OpenCV + numpy.

The upstream reference (BowenBZ/RGBD_VisualOdometry) publishes no benchmark
numbers (BASELINE.md), and its C++ stack (OpenCV 3.1 + g2o + Sophus) cannot be
built in this sandbox (zero egress).  This module is a *faithful CPU
re-implementation of the reference algorithm* using the same OpenCV kernels
the reference calls (`cv2.ORB_create`, `cv2.FlannBasedMatcher` with LSH,
`cv2.solvePnPRansac` P3P) plus numpy twins of its g2o optimizations, so that
the TPU framework's `vs_baseline` is measured-vs-measured on identical
synthetic sequences instead of estimated.

Semantics mirrored 1:1 from the reference (citations are /root/reference):
  - frontend FSM + coarse/fine double match/PnP rounds  src/frontend.cpp:94-144
  - tracking map + <100 fallback                        src/frontend.cpp:156-166
  - candidate filter outlier/frustum/angle              src/frontend.cpp:171-184,
                                                        src/frame.cpp:70-91
  - FLANN-LSH(5,10,2) match + max(min_dis*ratio, 30)    src/frontend.cpp:33,186-211
  - solvePnPRansac(P3P, 100 it, 4 px, 0.99, seeded)     src/frontend.cpp:233-242
  - g2o pose-only LM: Huber sqrt(7.815), 10 it,
    chi2>1 -> level 1, drop kernels, 10 it              src/frontend.cpp:256-312
  - IsGoodEstimation / IsKeyframe thresholds            src/frontend.cpp:334-364
  - depth lookup with 4-neighbor fallback               src/frame.cpp:43-67
  - covisibility weights, >=15 active                   src/frame.cpp:93-121
  - mappoint viewing-normal running mean                include/myslam/mappoint.h:59-64
  - triangulation DLT + sigma ratio gate + the
    reference's break-after-first-success quirk         src/frontend.cpp:465-506,
                                                        include/myslam/util.h:16-34
  - backend local BA: covisible window, KF id 0 fixed,
    fixed outside observers, marginalized points
    (Schur), two rounds of 10 with chi2 pruning that
    removes observations                                src/backend.cpp:19-195
  - backend thread, latest-keyframe-wins                src/backend.cpp:7-17
  - per-frame timing around AddFrame                    app/run_vo.cpp:104-109

This file is intentionally NOT part of the TPU package: it is the measuring
stick, built on the same third-party kernels as the reference.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import threading
import time

import cv2
import numpy as np

HUBER_DELTA = np.sqrt(7.815)  # src/frontend.cpp:282, src/backend.cpp:84


# --------------------------------------------------------------------------
# SE(3) helpers (numpy twins of Sophus; translation-first tangent like
# Sophus::SE3d::log used at src/frontend.cpp:344)
# --------------------------------------------------------------------------

def so3_exp(phi):
    theta = np.linalg.norm(phi)
    if theta < 1e-12:
        return np.eye(3) + _hat(phi)
    a = phi / theta
    A = _hat(a)
    return np.eye(3) + np.sin(theta) * A + (1 - np.cos(theta)) * (A @ A)


def so3_log(R):
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos)
    if theta < 1e-9:
        w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        return 0.5 * w
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return theta / (2 * np.sin(theta)) * w


def _hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0.0]])


def se3_exp(xi):
    """xi = [rho(3), phi(3)] -> (R, t); left Jacobian V applied to rho."""
    rho, phi = xi[:3], xi[3:]
    theta = np.linalg.norm(phi)
    R = so3_exp(phi)
    if theta < 1e-9:
        V = np.eye(3) + 0.5 * _hat(phi)
    else:
        a = phi / theta
        A = _hat(a)
        V = (
            np.eye(3)
            + (1 - np.cos(theta)) / theta * A
            + (theta - np.sin(theta)) / theta * (A @ A)
        )
    return R, V @ rho


def se3_log(R, t):
    phi = so3_log(R)
    theta = np.linalg.norm(phi)
    if theta < 1e-9:
        Vinv = np.eye(3) - 0.5 * _hat(phi)
    else:
        a = phi / theta
        A = _hat(a)
        half = theta / 2.0
        Vinv = (
            np.eye(3)
            - half * A
            + (1 - half / np.tan(half)) * (A @ A)
        )
    return np.concatenate([Vinv @ t, phi])


def se3_mul(a, b):
    Ra, ta = a
    Rb, tb = b
    return Ra @ Rb, Ra @ tb + ta


def se3_inv(a):
    R, t = a
    return R.T, -R.T @ t


# --------------------------------------------------------------------------
# Map data model (src/frame.cpp, src/mappoint.cpp, src/mapmanager.cpp)
# --------------------------------------------------------------------------

class Mappoint:
    __slots__ = (
        "id", "pos", "descriptor", "norm", "observations",
        "triangulated", "optimized", "outlier",
    )

    def __init__(self, mid, pos, descriptor):
        self.id = mid
        self.pos = np.asarray(pos, float)
        self.descriptor = descriptor.copy()
        self.norm = np.zeros(3)
        self.observations = {}  # keyframe id -> (u, v)
        self.triangulated = False
        self.optimized = False
        self.outlier = False

    def add_observed_by(self, kf_id, uv, cam_center):
        # mappoint.h:59-64 running normalized mean
        assert kf_id not in self.observations
        self.observations[kf_id] = uv
        d = self.pos - cam_center
        n = d / max(np.linalg.norm(d), 1e-12)
        s = self.norm + n
        self.norm = s / max(np.linalg.norm(s), 1e-12)

    def remove_observed_by(self, kf_id):
        # mappoint.cpp:39-49
        self.observations.pop(kf_id, None)
        if not self.observations:
            self.outlier = True


class Keyframe:
    __slots__ = ("id", "timestamp", "depth", "R", "t", "observed", "covis_w", "active_covis")

    def __init__(self, fid, timestamp, depth):
        self.id = fid
        self.timestamp = timestamp
        self.depth = depth
        self.R = np.eye(3)
        self.t = np.zeros(3)
        self.observed = set()  # mappoint ids
        self.covis_w = {}  # other kf id -> weight
        self.active_covis = set()

    @property
    def pose(self):
        return self.R, self.t

    def set_pose(self, R, t):
        # always copy: callers hand us live arrays, and cv2.solvePnPRansac
        # mutates its rvec/tvec arguments in place
        self.R, self.t = np.array(R, float), np.array(t, float)

    def cam_center(self):
        return -self.R.T @ self.t

    def add_observed_mappoint(self, vo_map, mid, uv):
        # src/frame.cpp:93-121 (symmetric covisibility weight update)
        assert mid not in self.observed
        self.observed.add(mid)
        mp = vo_map.mappoints[mid]
        mp.add_observed_by(self.id, uv, self.cam_center())
        for other_id in mp.observations:
            if other_id == self.id:
                continue
            w = self.covis_w.get(other_id, 0) + 1
            self.covis_w[other_id] = w
            if w >= 15:
                self.active_covis.add(other_id)
            vo_map.keyframes[other_id]._update_covis(self.id, w)

    def remove_observed_mappoint(self, vo_map, mid):
        # src/frame.cpp:123-154
        if mid not in self.observed:
            return
        self.observed.discard(mid)
        mp = vo_map.mappoints[mid]
        mp.remove_observed_by(self.id)
        for other_id in mp.observations:
            if other_id == self.id:
                continue
            w = self.covis_w.get(other_id, 0) - 1
            if w <= 0:
                self.covis_w.pop(other_id, None)
                w = 0
            else:
                self.covis_w[other_id] = w
                if w < 15:
                    self.active_covis.discard(other_id)
            other = vo_map.keyframes.get(other_id)
            if other is not None:
                other._update_covis(self.id, w)

    def _update_covis(self, other_id, w):
        # src/frame.cpp:157-171
        if w == 0:
            self.covis_w.pop(other_id, None)
            self.active_covis.discard(other_id)
        elif w >= 15:
            self.covis_w[other_id] = w
            self.active_covis.add(other_id)
        else:
            self.covis_w[other_id] = w
            self.active_covis.discard(other_id)


class Map:
    def __init__(self):
        self.keyframes = {}
        self.mappoints = {}
        self._lock = threading.Lock()

    def mappoints_around_keyframe(self, kf):
        # src/mapmanager.cpp:14-38
        ids = set(kf.active_covis)
        ids.add(kf.id)
        out = {}
        for kid in ids:
            for mid in self.keyframes[kid].observed:
                mp = self.mappoints.get(mid)
                if mp is not None and not mp.outlier:
                    out[mid] = mp
        return out


# --------------------------------------------------------------------------
# g2o pose-only LM twin (src/frontend.cpp:256-312, g2o_types.h:72-108)
# --------------------------------------------------------------------------

def _project_jac(K, R, t, pts):
    """Project world pts; return uv [N,2], 2x6 pose Jacobians [N,2,6], pc [N,3].

    Left-multiplicative update exp(delta)*T with delta=[rho, phi]
    (g2o_types.h:56-60): d(pc)/d rho = I, d(pc)/d phi = -hat(pc).
    """
    pc = pts @ R.T + t
    x, y, z = pc[:, 0], pc[:, 1], np.maximum(pc[:, 2], 1e-9)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u = fx * x / z + cx
    v = fy * y / z + cy
    # d(uv)/d(pc)
    zi = 1.0 / z
    J_uv_pc = np.zeros((len(pts), 2, 3))
    J_uv_pc[:, 0, 0] = fx * zi
    J_uv_pc[:, 0, 2] = -fx * x * zi * zi
    J_uv_pc[:, 1, 1] = fy * zi
    J_uv_pc[:, 1, 2] = -fy * y * zi * zi
    # d(pc)/d(delta) : [I | -hat(pc)]
    J_pc_d = np.zeros((len(pts), 3, 6))
    J_pc_d[:, 0, 0] = J_pc_d[:, 1, 1] = J_pc_d[:, 2, 2] = 1.0
    J_pc_d[:, 0, 4] = pc[:, 2]
    J_pc_d[:, 0, 5] = -pc[:, 1]
    J_pc_d[:, 1, 3] = -pc[:, 2]
    J_pc_d[:, 1, 5] = pc[:, 0]
    J_pc_d[:, 2, 3] = pc[:, 1]
    J_pc_d[:, 2, 4] = -pc[:, 0]
    J = np.einsum("nij,njk->nik", J_uv_pc, J_pc_d)
    return np.stack([u, v], axis=1), J, pc


def _huber_weight(chi2, active):
    w = np.ones_like(chi2)
    over = active & (chi2 > HUBER_DELTA**2)
    w[over] = HUBER_DELTA / np.sqrt(chi2[over])
    return w


def pose_only_lm(K, R, t, pts3d, uv, n_iters, robust):
    """One g2o `optimize(n)` round on a single pose vertex (Levenberg)."""
    lam = None
    nu = 2.0
    for _ in range(n_iters):
        proj, J, _ = _project_jac(K, R, t, pts3d)
        r = uv - proj  # g2o error = measurement - h(x)
        chi2 = np.sum(r * r, axis=1)
        w = _huber_weight(chi2, np.ones(len(chi2), bool)) if robust else np.ones(len(chi2))
        # residual sign: J is d(h)/d(delta), error e = z - h -> de/dd = -J
        Jw = J * w[:, None, None]
        H = np.einsum("nai,naj->ij", Jw, J)
        b = np.einsum("nai,na->i", Jw, r)
        if lam is None:
            lam = 1e-5 * np.max(np.diag(H))  # g2o Levenberg initial lambda
        cost = np.sum(_robust_chi2(chi2, robust))
        try:
            dx = np.linalg.solve(H + lam * np.eye(6), b)
        except np.linalg.LinAlgError:
            break
        dR, dt = se3_exp(dx)
        R_new, t_new = se3_mul((dR, dt), (R, t))
        proj2, _, _ = _project_jac(K, R_new, t_new, pts3d)
        chi2_new = np.sum((uv - proj2) ** 2, axis=1)
        if np.sum(_robust_chi2(chi2_new, robust)) < cost:
            R, t = R_new, t_new
            lam *= 0.5
            nu = 2.0
        else:
            lam *= nu
            nu *= 2.0
    return R, t


def _robust_chi2(chi2, robust):
    if not robust:
        return chi2
    d2 = HUBER_DELTA**2
    return np.where(chi2 <= d2, chi2, 2 * HUBER_DELTA * np.sqrt(chi2) - d2)


# --------------------------------------------------------------------------
# FrontEnd (src/frontend.cpp)
# --------------------------------------------------------------------------

INITIALIZING, TRACKING, LOST = 0, 1, 2


class FrontEnd:
    def __init__(self, cfg, vo_map, backend=None):
        self.cfg = cfg
        self.map = vo_map
        self.backend = backend
        self.state = INITIALIZING
        self.K = np.array(
            [[cfg["camera_fx"], 0, cfg["camera_cx"]],
             [0, cfg["camera_fy"], cfg["camera_cy"]],
             [0, 0, 1.0]]
        )
        self.depth_scale = cfg["camera_depth_scale"]
        self.orb = cv2.ORB_create(
            int(cfg["number_of_features"]),
            float(cfg["scale_factor"]),
            int(cfg["level_pyramid"]),
        )  # src/frontend.cpp:35-37
        self.flann = cv2.FlannBasedMatcher(
            dict(algorithm=6, table_number=5, key_size=10, multi_probe_level=2), {}
        )  # src/frontend.cpp:33
        self.min_dis_ratio = float(cfg["match_ratio"])
        self.max_lost = float(cfg["max_num_lost"])
        self.min_inliers = int(cfg["min_inliers"])
        self.kf_min_rot = float(cfg["keyframe_rotation"])
        self.kf_min_trans = float(cfg["keyframe_translation"])
        self.lost_count = 0
        self.next_frame_id = 0
        self.next_mpt_id = 0
        self.pose = (np.eye(3), np.zeros(3))  # T_c_w of current frame
        self.keyframe_ref = None
        self.tracking_map_kf = None
        self.tracking_map = {}
        self.num_inliers = 0
        # stage counters for parity diagnostics (frontend.cpp:212-214,243)
        self.stats = dict(frames=0, keyframes=0, matches=0, inliers=0, mappoints=0)

    # -- per-frame entry (src/frontend.cpp:45-79) --
    def add_frame(self, rgb, depth_u16, timestamp):
        self.rgb = rgb
        self.depth = depth_u16
        self.timestamp = timestamp
        self.frame_id = self.next_frame_id
        self.next_frame_id += 1
        self.stats["frames"] += 1
        if self.state == INITIALIZING:
            self._initialize()
            return True
        if self.state == LOST:
            return False
        return self._track()

    def _extract(self):
        kpts, descs = self.orb.detectAndCompute(self.rgb, None)
        self.kpts = kpts or []
        self.descs = descs if descs is not None else np.zeros((0, 32), np.uint8)

    def _initialize(self):
        # src/frontend.cpp:81-92
        self._extract()
        kf = self._insert_keyframe()
        self.pnp_matched_kpt_idx = set()
        self._create_new_mappoints(kf)
        self.state = TRACKING
        self.keyframe_ref = kf

    @property
    def prev_pose(self):
        # framePrev_ always aliases the last keyframe (frontend.cpp:90-91,
        # 140-141), a shared object the backend thread refines in place -
        # reading it live propagates BA corrections into the next seed.
        return self.keyframe_ref.pose

    def _track(self):
        # src/frontend.cpp:94-144
        self.pose = self.prev_pose
        self._extract()
        for _ in range(2):  # coarse + fine rounds
            self._match_tracking_map()
            self._estimate_pose_pnp()
        if not self._is_good_estimation():
            self.lost_count += 2  # reference double-increment quirk :113-114
            if self.lost_count > self.max_lost:
                self.state = LOST
            return False
        self.lost_count = 0
        if not self._is_keyframe():
            return True
        kf = self._insert_keyframe()
        # AddCurrentKeyframeObservations (frontend.cpp:366-370); under the map
        # lock because the backend thread iterates mp.observations while
        # assembling its graph (the reference guards the same state with
        # Frame::observationMutex_/Mappoint::observationMutex_, frame.h:89-92)
        with self.map._lock:
            for mid in self.pnp_matched_mpt_ids:
                if mid in self.flann_matched:  # uv from the flann map
                    kf.add_observed_mappoint(self.map, mid, self.flann_matched[mid][0])
        self._create_new_mappoints(kf)
        self._triangulate_tracking_map(kf)
        if self.backend is not None:
            self.backend.optimize_covisible_graph(kf)
        self.keyframe_ref = kf
        return True

    def _insert_keyframe(self):
        kf = Keyframe(self.frame_id, self.timestamp, self.depth)
        kf.set_pose(*self.pose)
        with self.map._lock:
            self.map.keyframes[kf.id] = kf
        self.stats["keyframes"] += 1
        return kf

    def _get_depth(self, pt):
        # src/frame.cpp:43-67 (reference has no bounds check = UB; we clamp)
        h, w = self.depth.shape
        x = min(max(int(round(pt[0])), 0), w - 1)
        y = min(max(int(round(pt[1])), 0), h - 1)
        d = self.depth[y, x]
        if d != 0:
            return d / self.depth_scale
        for dx, dy in ((-1, 0), (0, -1), (1, 0), (0, 1)):
            yy = min(max(y + dy, 0), h - 1)
            xx = min(max(x + dx, 0), w - 1)
            d = self.depth[yy, xx]
            if d != 0:
                return d / self.depth_scale
        return -1.0

    def _could_observe(self, mp):
        # src/frame.cpp:70-91
        R, t = self.pose
        pc = R @ mp.pos + t
        if pc[2] < 0:
            return False
        u = self.K[0, 0] * pc[0] / pc[2] + self.K[0, 2]
        v = self.K[1, 1] * pc[1] / pc[2] + self.K[1, 2]
        h, w = self.depth.shape
        if u < 0 or u >= w or v < 0 or v >= h:
            return False
        direction = mp.pos - (-R.T @ t)
        direction = direction / max(np.linalg.norm(direction), 1e-12)
        angle = np.arccos(np.clip(direction @ mp.norm, -1, 1))
        return angle <= np.pi / 6

    def _match_tracking_map(self):
        # src/frontend.cpp:156-215
        if self.tracking_map_kf is not self.keyframe_ref:
            self.tracking_map_kf = self.keyframe_ref
            with self.map._lock:
                self.tracking_map = self.map.mappoints_around_keyframe(self.keyframe_ref)
        if len(self.tracking_map) < 100:
            with self.map._lock:
                self.tracking_map = dict(self.map.mappoints.items())
        # Vectorized candidate filter (same predicate as the reference's
        # per-mappoint C++ loop frontend.cpp:171-184 / frame.cpp:70-91; a
        # Python-level loop here would bill interpreter overhead to the
        # baseline, so it is batched through numpy instead).
        mps = list(self.tracking_map.values())
        self.flann_matched = {}  # mappoint id -> (uv, kpt_idx)
        if not mps or len(self.kpts) == 0:
            return
        pos = np.array([mp.pos for mp in mps])
        norm = np.array([mp.norm for mp in mps])
        inlier = np.array([not mp.outlier for mp in mps])
        R, t = self.pose
        pc = pos @ R.T + t
        z = pc[:, 2]
        zs = np.where(np.abs(z) < 1e-12, 1e-12, z)
        u = self.K[0, 0] * pc[:, 0] / zs + self.K[0, 2]
        v = self.K[1, 1] * pc[:, 1] / zs + self.K[1, 2]
        h, w = self.depth.shape
        direction = pos - (-R.T @ t)
        dn = direction / np.maximum(np.linalg.norm(direction, axis=1, keepdims=True), 1e-12)
        cosang = np.clip(np.sum(dn * norm, axis=1), -1, 1)
        ok = (
            inlier & (z >= 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
            & (np.arccos(cosang) <= np.pi / 6)
        )
        candidates = [mp for mp, o in zip(mps, ok) if o]
        if not candidates:
            return
        cand_descs = np.stack([mp.descriptor for mp in candidates])
        matches = self.flann.match(cand_descs, self.descs)
        if not matches:
            return
        min_dis = min(m.distance for m in matches)
        max_dis = max(min_dis * self.min_dis_ratio, 30.0)
        for m in matches:
            if m.distance <= max_dis:
                kp = self.kpts[m.trainIdx]
                self.flann_matched[candidates[m.queryIdx].id] = (
                    np.array(kp.pt), m.trainIdx
                )
        self.stats["matches"] += len(self.flann_matched)

    def _estimate_pose_pnp(self):
        # src/frontend.cpp:217-332
        self.pnp_matched_mpt_ids = set()
        self.pnp_matched_kpt_idx = set()
        mids = list(self.flann_matched.keys())
        if len(mids) < 4:
            self.num_inliers = 0
            return
        pts3d = np.array([self.map.mappoints[m].pos for m in mids], np.float64)
        pts2d = np.array([self.flann_matched[m][0] for m in mids], np.float64)
        R, t = self.pose
        rvec, _ = cv2.Rodrigues(np.asarray(R))
        # np.array (copy!): solvePnPRansac with useExtrinsicGuess writes its
        # result into tvec in place - a view here would corrupt live state
        tvec = np.array(t, np.float64).reshape(3, 1)
        try:
            ok, rvec, tvec, inliers = cv2.solvePnPRansac(
                pts3d, pts2d, self.K, None, rvec, tvec, True,
                100, 4.0, 0.99, None, cv2.SOLVEPNP_P3P,
            )
        except cv2.error:
            ok, inliers = False, None
        if not ok or inliers is None or len(inliers) == 0:
            self.num_inliers = 0
            return
        inl = inliers.ravel()
        self.num_inliers = len(inl)
        self.stats["inliers"] += self.num_inliers
        R, _ = cv2.Rodrigues(rvec)
        t = tvec.ravel()
        # pose-only BA, round 1 (robust), chi2 gate, round 2 (plain)
        p3, p2 = pts3d[inl], pts2d[inl]
        R, t = pose_only_lm(self.K, R, t, p3, p2, 10, robust=True)
        proj, _, _ = _project_jac(self.K, R, t, p3)
        chi2 = np.sum((p2 - proj) ** 2, axis=1)
        keep = chi2 <= 1.0
        if np.any(keep):
            R, t = pose_only_lm(self.K, R, t, p3[keep], p2[keep], 10, robust=False)
        self.pose = (R, t)
        proj, _, _ = _project_jac(self.K, R, t, p3)
        chi2 = np.sum((p2 - proj) ** 2, axis=1)
        for i, e in enumerate(inl):
            if chi2[i] <= 1.0:
                self.pnp_matched_mpt_ids.add(mids[e])
                self.pnp_matched_kpt_idx.add(self.flann_matched[mids[e]][1])

    def _is_good_estimation(self):
        # src/frontend.cpp:334-351
        if self.num_inliers < self.min_inliers:
            return False
        T_r_c = se3_mul(self.prev_pose, se3_inv(self.pose))
        return np.linalg.norm(se3_log(*T_r_c)) <= 5.0

    def _is_keyframe(self):
        # src/frontend.cpp:353-364
        T_r_c = se3_mul(self.prev_pose, se3_inv(self.pose))
        d = se3_log(*T_r_c)
        return np.linalg.norm(d[3:]) > self.kf_min_rot or np.linalg.norm(d[:3]) > self.kf_min_trans

    def _create_new_mappoints(self, kf):
        # src/frontend.cpp:372-406 (vectorized depth probe + backprojection;
        # same per-keypoint predicate/order as the reference loop)
        if not self.kpts:
            return
        R, t = self.pose
        Rwc, c = R.T, -R.T @ t
        h, w = self.depth.shape
        pts = np.array([kp.pt for kp in self.kpts])
        x = np.clip(np.rint(pts[:, 0]).astype(int), 0, w - 1)
        y = np.clip(np.rint(pts[:, 1]).astype(int), 0, h - 1)
        # center then 4-neighbor fallback (frame.cpp:54-64), first hit wins
        d = self.depth[y, x].astype(np.float64)
        for dx, dy in ((-1, 0), (0, -1), (1, 0), (0, 1)):
            yy = np.clip(y + dy, 0, h - 1)
            xx = np.clip(x + dx, 0, w - 1)
            d = np.where(d == 0, self.depth[yy, xx], d)
        depth_m = np.where(d == 0, -1.0, d / self.depth_scale)
        pc = np.stack(
            [(pts[:, 0] - self.K[0, 2]) * depth_m / self.K[0, 0],
             (pts[:, 1] - self.K[1, 2]) * depth_m / self.K[1, 1],
             depth_m], axis=1,
        )
        pos_all = pc @ Rwc.T + c
        created = 0
        with self.map._lock:
            for idx in range(len(self.kpts)):
                if idx in self.pnp_matched_kpt_idx or depth_m[idx] < 0:
                    continue
                mp = Mappoint(self.next_mpt_id, pos_all[idx], self.descs[idx])
                self.next_mpt_id += 1
                self.map.mappoints[mp.id] = mp
                kf.add_observed_mappoint(self.map, mp.id, pts[idx])
                created += 1
        self.stats["mappoints"] += created

    def _triangulate_tracking_map(self, kf):
        # src/frontend.cpp:465-506 incl. the break-after-first-success quirk.
        # Runs under the map lock: the backend's prune writeback mutates
        # mp.observations concurrently (reference: observationMutex_).
        with self.map._lock:
            self._triangulate_tracking_map_locked(kf)

    def _triangulate_tracking_map_locked(self, kf):
        for mp in self.tracking_map.values():
            if mp.outlier or mp.triangulated or mp.optimized:
                continue
            if mp.id not in self.pnp_matched_mpt_ids:
                continue
            rows = []
            for kid, uv in mp.observations.items():
                okf = self.map.keyframes.get(kid)
                if okf is None:
                    continue
                x = (uv[0] - self.K[0, 2]) / self.K[0, 0]
                y = (uv[1] - self.K[1, 2]) / self.K[1, 1]
                M = np.hstack([okf.R, okf.t[:, None]])
                rows.append(x * M[2] - M[0])
                rows.append(y * M[2] - M[1])
            if len(rows) >= 4:
                A = np.stack(rows)
                _, s, Vt = np.linalg.svd(A)
                pw = Vt[3] / Vt[3, 3]
                if s[3] / s[2] < 1e-2 and pw[2] > 0:
                    mp.pos = pw[:3]
                    mp.triangulated = True
                    break  # reference quirk frontend.cpp:501


# --------------------------------------------------------------------------
# Backend local BA (src/backend.cpp) - numpy Schur LM twin
# --------------------------------------------------------------------------

class Backend:
    """Latest-keyframe-wins async local BA thread (src/backend.cpp:7-17)."""

    def __init__(self, cfg, vo_map, K, threaded=True):
        self.map = vo_map
        self.K = K
        self.chi2_th = float(cfg.get("chi2_th", 1.0))
        self.threaded = threaded
        self._kf = None
        self._cv = threading.Condition()
        self._running = True
        self.runs = 0
        if threaded:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def optimize_covisible_graph(self, kf):
        if not self.threaded:
            self._optimize(kf)
            return
        with self._cv:
            self._kf = kf  # latest wins (backend.h:35)
            self._cv.notify()

    def stop(self):
        if not self.threaded:
            return
        with self._cv:
            self._running = False
            self._cv.notify()
        self._thread.join(timeout=30)

    def _loop(self):
        while True:
            with self._cv:
                while self._kf is None and self._running:
                    self._cv.wait()
                if not self._running:
                    return
                kf, self._kf = self._kf, None
            self._optimize(kf)

    def _optimize(self, kf_curr):
        # graph assembly: src/backend.cpp:29-137
        self.runs += 1
        with self.map._lock:
            kf_ids = set(kf_curr.active_covis)
            kf_ids.add(kf_curr.id)
            kfs = {k: self.map.keyframes[k] for k in kf_ids if k in self.map.keyframes}
            mpts = {}
            for kf in kfs.values():
                for mid in kf.observed:
                    mp = self.map.mappoints.get(mid)
                    if mp is not None and not mp.outlier and mid not in mpts:
                        mpts[mid] = mp
            fixed_kfs = {}
            edges = []  # (kf_id, mpt_id, uv)
            for mid, mp in mpts.items():
                for kid, uv in mp.observations.items():
                    if kid in kfs:
                        pass
                    elif kid in self.map.keyframes:
                        fixed_kfs[kid] = self.map.keyframes[kid]
                    else:
                        continue
                    edges.append((kid, mid, uv))
            cam_ids = list(kfs.keys()) + list(fixed_kfs.keys())
            cam_pose = {k: (self.map.keyframes[k].R.copy(), self.map.keyframes[k].t.copy())
                        for k in cam_ids}
            pt_pos = {m: mp.pos.copy() for m, mp in mpts.items()}
        if not edges or not mpts:
            return
        # backend.cpp:55 fixes keyframe id 0; upstream frame ids actually start
        # at 1 (frame.cpp:25 pre-increment), so that check never fires there -
        # a latent gauge bug.  Our ids start at 0, so the first keyframe IS
        # anchored, which is the evident intent.
        fixed = {k: (k == 0 or k in fixed_kfs) for k in cam_ids}

        cam_index = {k: i for i, k in enumerate(cam_ids)}
        pt_index = {m: i for i, m in enumerate(pt_pos)}
        e_cam = np.array([cam_index[e[0]] for e in edges])
        e_pt = np.array([pt_index[e[1]] for e in edges])
        e_uv = np.array([e[2] for e in edges], float)
        level = np.zeros(len(edges), bool)  # True = outlier level 1

        poses = [cam_pose[k] for k in cam_ids]
        pts = np.array([pt_pos[m] for m in pt_pos])
        fixed_mask = np.array([fixed[k] for k in cam_ids])

        poses, pts = self._lm_rounds(poses, pts, e_cam, e_pt, e_uv, ~level,
                                     fixed_mask, 10, robust=True)
        chi2 = self._chi2(poses, pts, e_cam, e_pt, e_uv)
        prune1 = (~level) & (chi2 > self.chi2_th)
        level |= prune1
        poses, pts = self._lm_rounds(poses, pts, e_cam, e_pt, e_uv, ~level,
                                     fixed_mask, 10, robust=False)
        chi2 = self._chi2(poses, pts, e_cam, e_pt, e_uv)
        prune2 = (~level) & (chi2 > self.chi2_th)

        with self.map._lock:
            for i in np.nonzero(prune1 | prune2)[0]:
                kid, mid, _ = edges[i]
                kf = self.map.keyframes.get(kid)
                if kf is not None:
                    kf.remove_observed_mappoint(self.map, mid)
            # write back (src/backend.cpp:182-194)
            for k, i in cam_index.items():
                if not fixed[k]:
                    self.map.keyframes[k].set_pose(*poses[i])
            for m, i in pt_index.items():
                mp = self.map.mappoints[m]
                mp.optimized = True
                if not mp.outlier:
                    mp.pos = pts[i]

    def _chi2(self, poses, pts, e_cam, e_pt, e_uv):
        r = self._residuals(poses, pts, e_cam, e_pt, e_uv)
        return np.sum(r * r, axis=1)

    def _residuals(self, poses, pts, e_cam, e_pt, e_uv):
        Rs = np.array([p[0] for p in poses])
        ts = np.array([p[1] for p in poses])
        pc = np.einsum("eij,ej->ei", Rs[e_cam], pts[e_pt]) + ts[e_cam]
        z = np.maximum(pc[:, 2], 1e-9)
        u = self.K[0, 0] * pc[:, 0] / z + self.K[0, 2]
        v = self.K[1, 1] * pc[:, 1] / z + self.K[1, 2]
        return e_uv - np.stack([u, v], axis=1)

    def _lm_rounds(self, poses, pts, e_cam, e_pt, e_uv, active, fixed_mask,
                   n_iters, robust):
        """Schur-complement Levenberg over (poses, points).

        Assembly is fully vectorized (pair-index tables + bincount
        scatter-adds): the first twin paid ~85% of its BA time in a Python
        per-point loop and ``np.add.at``'s buffered fancy-index path, which
        under-represented what g2o's compiled C++ achieves on the same CPU
        and inflated the measured speedup (VERDICT r3 weak 4 / task 4)."""
        C, P = len(poses), len(pts)
        lam = None
        nu = 2.0
        # pairwise index tables for the Schur off-diagonal: for each point
        # with k observing edges, all k^2 ordered edge pairs (precomputed
        # once - the edge set is fixed; pruning acts through weights)
        order = np.argsort(e_pt, kind="stable")
        counts = np.bincount(e_pt, minlength=P)
        k2 = counts * counts
        starts = np.cumsum(counts) - counts
        loc = np.arange(int(k2.sum())) - np.repeat(np.cumsum(k2) - k2, k2)
        ka = np.repeat(counts, k2)
        pair_a = order[np.repeat(starts, k2) + loc // np.maximum(ka, 1)]
        pair_b = order[np.repeat(starts, k2) + loc % np.maximum(ka, 1)]
        pair_cc = e_cam[pair_a] * C + e_cam[pair_b]  # flat [C, C] index

        def accum(idx, vals, n):
            """bincount-based scatter-add of vals [T, ...] into [n, ...]."""
            flat = vals.reshape(len(vals), -1)
            out = np.empty((n, flat.shape[1]))
            for c in range(flat.shape[1]):
                out[:, c] = np.bincount(idx, weights=flat[:, c], minlength=n)
            return out.reshape((n,) + vals.shape[1:])

        for _ in range(n_iters):
            Rs = np.array([p[0] for p in poses])
            ts = np.array([p[1] for p in poses])
            pc = np.einsum("eij,ej->ei", Rs[e_cam], pts[e_pt]) + ts[e_cam]
            uvp, Jc, _ = _project_jac_batch(self.K, pc)
            r = e_uv - uvp
            chi2 = np.sum(r * r, axis=1)
            w = _huber_weight(chi2, active) if robust else np.ones(len(chi2))
            w = np.where(active, w, 0.0)
            # point jacobian = J_pose[:, :3] @ R  (g2o_types.h:172-176)
            Jp = np.einsum("eai,eij->eaj", Jc[:, :, :3], Rs[e_cam])
            Jc = np.where(fixed_mask[e_cam][:, None, None], 0.0, Jc)
            cost = np.sum(_robust_chi2(chi2, robust) * np.where(active, 1.0, 0.0))

            Hcc = accum(e_cam, np.einsum("eai,eaj,e->eij", Jc, Jc, w), C)
            Hpp = accum(e_pt, np.einsum("eai,eaj,e->eij", Jp, Jp, w), P)
            bc = accum(e_cam, np.einsum("eai,ea,e->ei", Jc, r, w), C)
            bp = accum(e_pt, np.einsum("eai,ea,e->ei", Jp, r, w), P)
            W = np.einsum("eai,eaj,e->eij", Jc, Jp, w)  # [E,6,3]

            if lam is None:
                dmax = max(
                    np.max(np.einsum("cii->ci", Hcc), initial=0.0),
                    np.max(np.einsum("pii->pi", Hpp), initial=0.0),
                )
                lam = 1e-5 * max(dmax, 1e-9)
            Hpp_d = Hpp + lam * np.eye(3)
            Hpp_inv = np.linalg.inv(Hpp_d)
            Y = np.einsum("eij,ejk->eik", W, Hpp_inv[e_pt])  # [E,6,3]

            # Schur: S = Hcc - sum over same-point edge pairs of Y_a W_b^T
            blk = np.einsum("kij,klj->kil", Y[pair_a], W[pair_b])  # [T,6,6]
            S4 = accum(pair_cc, blk, C * C).reshape(C, C, 6, 6)
            S = -S4.transpose(0, 2, 1, 3)
            S[np.arange(C), :, np.arange(C), :] += Hcc + lam * np.eye(6)
            b_schur = bc - accum(
                e_cam, np.einsum("eij,ej->ei", Y, bp[e_pt]), C
            )

            free = ~fixed_mask
            Sf = S[free][:, :, free, :].reshape(free.sum() * 6, free.sum() * 6)
            bf = b_schur[free].reshape(-1)
            try:
                dc_f = np.linalg.solve(Sf, bf)
            except np.linalg.LinAlgError:
                break
            dc = np.zeros((C, 6))
            dc[free] = dc_f.reshape(-1, 6)
            # back-substitute points: dp = Hpp^-1 (bp - W^T dc)
            WTdc = accum(e_pt, np.einsum("eij,ei->ej", W, dc[e_cam]), P)
            dp = np.einsum("pij,pj->pi", Hpp_inv, bp - WTdc)

            new_poses = []
            for i, (R, t) in enumerate(poses):
                if fixed_mask[i]:
                    new_poses.append((R, t))
                else:
                    dR, dt = se3_exp(dc[i])
                    new_poses.append(se3_mul((dR, dt), (R, t)))
            new_pts = pts + dp
            # evaluate
            Rs2 = np.array([p[0] for p in new_poses])
            ts2 = np.array([p[1] for p in new_poses])
            pc2 = np.einsum("eij,ej->ei", Rs2[e_cam], new_pts[e_pt]) + ts2[e_cam]
            uv2, _, _ = _project_jac_batch(self.K, pc2)
            chi2n = np.sum((e_uv - uv2) ** 2, axis=1)
            costn = np.sum(_robust_chi2(chi2n, robust) * np.where(active, 1.0, 0.0))
            if costn < cost:
                poses, pts = new_poses, new_pts
                lam *= 0.5
                nu = 2.0
            else:
                lam *= nu
                nu *= 2.0
        return poses, pts


def _project_jac_batch(K, pc):
    x, y, z = pc[:, 0], pc[:, 1], np.maximum(pc[:, 2], 1e-9)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u = fx * x / z + cx
    v = fy * y / z + cy
    zi = 1.0 / z
    n = len(pc)
    J_uv_pc = np.zeros((n, 2, 3))
    J_uv_pc[:, 0, 0] = fx * zi
    J_uv_pc[:, 0, 2] = -fx * x * zi * zi
    J_uv_pc[:, 1, 1] = fy * zi
    J_uv_pc[:, 1, 2] = -fy * y * zi * zi
    J_pc_d = np.zeros((n, 3, 6))
    J_pc_d[:, 0, 0] = J_pc_d[:, 1, 1] = J_pc_d[:, 2, 2] = 1.0
    J_pc_d[:, 0, 4] = pc[:, 2]
    J_pc_d[:, 0, 5] = -pc[:, 1]
    J_pc_d[:, 1, 3] = -pc[:, 2]
    J_pc_d[:, 1, 5] = pc[:, 0]
    J_pc_d[:, 2, 3] = pc[:, 1]
    J_pc_d[:, 2, 4] = -pc[:, 0]
    J = np.einsum("nij,njk->nik", J_uv_pc, J_pc_d)
    return np.stack([u, v], axis=1), J, pc


# --------------------------------------------------------------------------
# Harness
# --------------------------------------------------------------------------

DEFAULT_CFG = dict(
    camera_fx=517.3, camera_fy=516.5, camera_cx=318.6, camera_cy=255.3,
    camera_depth_scale=5000.0,
    number_of_features=500, scale_factor=1.2, level_pyramid=8,
    match_ratio=2.0, max_num_lost=10, min_inliers=10,
    keyframe_rotation=0.05, keyframe_translation=0.05,
    chi2_th=1.0,
)


def _load_synthetic():
    path = os.path.join(os.path.dirname(__file__), "..",
                        "rgbd_visualodometry_tpu", "io", "synthetic.py")
    spec = importlib.util.spec_from_file_location("_synthetic", os.path.abspath(path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _quat_to_R(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


BENCH_TRAJ = dict(step_t=(0.012, 0.002, 0.0), step_r=(0.0, 0.0, 0.003))


def run(n_frames=240, width=640, height=480, enable_ba=True, threaded_ba=True,
        seed=0, features=500, traj=BENCH_TRAJ, verbose=False, hard=False,
        frames=None):
    """Run the cv2 twin on the shared synthetic sequence (identical scene +
    trajectory parameters to bench.py's `_make_frames`); return results.

    ``hard=True`` uses the fr1-like difficulty preset (non-planar boxes,
    depth holes/noise, exposure flicker - ``synthetic.hard_scene``).
    ``frames`` supplies a pre-generated sequence (so tests can run the twin
    and the TPU pipeline on the SAME rendered frames without paying the
    renderer twice)."""
    synthetic = _load_synthetic()
    # cv2's RANSAC and FLANN-LSH draw from OpenCV's global RNG; unseeded,
    # the twin's ATE on the identical sequence spreads ~20% between runs
    # (observed 0.78-0.93 cm), which makes any "within 5% of the twin"
    # assertion a coin flip.  The reference binary is equally stochastic -
    # a fixed seed just picks one reproducible draw, chosen blind (0).
    cv2.setRNGSeed(0)
    cfg = dict(DEFAULT_CFG)
    cfg["number_of_features"] = features
    if frames is None:
        scene_kw = dict(
            width=width, height=height,
            fx=cfg["camera_fx"], fy=cfg["camera_fy"],
            cx=cfg["camera_cx"], cy=cfg["camera_cy"], seed=seed,
        )
        scene = synthetic.hard_scene(**scene_kw) if hard else synthetic.SyntheticScene(**scene_kw)
        frames = synthetic.generate_sequence(n_frames, scene=scene, **traj)

    vo_map = Map()
    K = np.array(
        [[cfg["camera_fx"], 0, cfg["camera_cx"]],
         [0, cfg["camera_fy"], cfg["camera_cy"]],
         [0, 0, 1.0]]
    )
    backend = Backend(cfg, vo_map, K, threaded=threaded_ba) if enable_ba else None
    fe = FrontEnd(cfg, vo_map, backend)

    est = []  # (timestamp, T_w_c center) for ATE
    est_full = []  # (timestamp, R_c_w, t_c_w) full poses for RPE
    gt = []
    times = []
    for f in frames:
        t0 = time.perf_counter()
        fe.add_frame(f.rgb, f.depth, f.timestamp)
        times.append(time.perf_counter() - t0)
        if fe.state == LOST:
            break
        R, t = fe.pose
        est.append((f.timestamp, -R.T @ t))  # T_w_c translation (run_vo.cpp:116)
        est_full.append((f.timestamp, R.copy(), t.copy()))
        q = f.T_c_w[:4]
        Rg = _quat_to_R(q)
        tg = f.T_c_w[4:7]
        gt.append((f.timestamp, -Rg.T @ tg))
    if backend is not None:
        backend.stop()

    times = np.array(times)
    e = np.array([p for _, p in est])
    g = np.array([p for _, p in gt])
    ate = _ate_rmse(e, g)
    return dict(
        frames_tracked=len(est),
        fps_mean=float(1.0 / times.mean()),
        fps_median=float(1.0 / np.median(times)),
        ms_per_frame_mean=float(times.mean() * 1e3),
        ate_rmse_m=float(ate),
        stats=fe.stats,
        ba_runs=backend.runs if backend else 0,
        # full estimated poses (timestamp, R_c_w, t_c_w) so offline RPE can
        # be computed against ground truth like tools/evaluate_rpe.py
        trajectory=est_full,
    )


def _ate_rmse(est, gt):
    """Horn alignment + RMSE (twin of tools/evaluate_ate.py:47-79)."""
    if len(est) < 2:
        return float("nan")
    mu_e, mu_g = est.mean(0), gt.mean(0)
    E, G = est - mu_e, gt - mu_g
    U, _, Vt = np.linalg.svd(E.T @ G)
    S = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = U @ S @ Vt
    aligned = (est - mu_e) @ R + mu_g
    return np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--features", type=int, default=500)
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument("--sync-ba", action="store_true",
                    help="run BA synchronously instead of the reference's thread")
    ap.add_argument("--hard", action="store_true",
                    help="fr1-like difficulty scene (boxes, depth holes/noise, flicker)")
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()
    res = run(
        n_frames=args.frames, width=args.width, height=args.height,
        enable_ba=not args.no_ba, threaded_ba=not args.sync_ba,
        features=args.features, hard=args.hard,
    )
    res = {k: v for k, v in res.items() if k != "trajectory"}  # ndarrays
    print(json.dumps(res, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
