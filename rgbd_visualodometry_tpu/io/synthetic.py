"""Synthetic RGB-D sequence generator with exact ground truth.

The reference has no test fixtures at all (SURVEY.md section 4); its only
"integration test" is running on a downloaded TUM sequence.  This module
renders a textured-plane world analytically - every pixel's color and depth
and every camera pose are exact - giving hermetic golden-trajectory tests,
benchmarks that need no dataset download, and the CLI demo mode.

World model: a plane ``z = plane_z`` (world frame) textured with a random
blocky pattern (sharp cell edges -> dense FAST corners at every cell
junction).  Rendering intersects each pixel ray with the plane; depth is the
camera-frame z of the hit, encoded TUM-style as ``uint16 = meters * 5000``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class SyntheticFrame(NamedTuple):
    rgb: np.ndarray  # [H, W, 3] uint8
    depth: np.ndarray  # [H, W] uint16
    timestamp: float
    T_c_w: np.ndarray  # [7] ground-truth pose (qw qx qy qz tx ty tz)


def _quat_rotate(q, v):
    w, x, y, z = q[0], q[1:2], q[2:3], q[3:4]
    qv = q[1:4]
    t = 2.0 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def _pose_inverse(T):
    q = T[:4] * np.array([1.0, -1, -1, -1])
    return np.concatenate([q, -_quat_rotate(q, T[4:7][None])[0]])


def _rotvec_to_quat(rv):
    theta = np.linalg.norm(rv)
    if theta < 1e-12:
        return np.array([1.0, 0, 0, 0])
    axis = rv / theta
    return np.concatenate([[np.cos(theta / 2)], np.sin(theta / 2) * axis])


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def make_pose(rotvec, trans) -> np.ndarray:
    return np.concatenate([_rotvec_to_quat(np.asarray(rotvec, float)), np.asarray(trans, float)])


class SyntheticScene:
    """Textured plane at ``z = plane_z`` with a deterministic texture."""

    def __init__(
        self,
        width: int = 640,
        height: int = 480,
        fx: float = 517.3,
        fy: float = 516.5,
        cx: float = 318.6,
        cy: float = 255.3,
        depth_scale: float = 5000.0,
        plane_z: float = 2.5,
        cell_size: float = 0.06,
        texture_cells: int = 1024,
        seed: int = 0,
    ):
        self.w, self.h = width, height
        self.fx, self.fy, self.cx, self.cy = fx, fy, cx, cy
        self.depth_scale = depth_scale
        self.plane_z = plane_z
        self.cell = cell_size
        rng = np.random.default_rng(seed)
        # RGB blocky texture with strong luma contrast
        self.tex = rng.integers(20, 236, (texture_cells, texture_cells, 3)).astype(np.uint8)
        u, v = np.meshgrid(np.arange(width), np.arange(height))
        self._dirs = np.stack(
            [(u - cx) / fx, (v - cy) / fy, np.ones_like(u, float)], axis=-1
        )  # camera-frame ray dirs, z=1

    def render(self, T_c_w: np.ndarray, timestamp: float = 0.0) -> SyntheticFrame:
        """Render RGB + depth from pose T_c_w (world->camera)."""
        T_w_c = _pose_inverse(np.asarray(T_c_w, float))
        q_wc, center = T_w_c[:4], T_w_c[4:7]
        d_w = _quat_rotate(q_wc, self._dirs.reshape(-1, 3)).reshape(self.h, self.w, 3)
        dz = d_w[..., 2]
        dz = np.where(np.abs(dz) < 1e-9, 1e-9, dz)
        t = (self.plane_z - center[2]) / dz  # camera-frame depth (dirs have z=1)
        hit = t > 0.05
        p_w = center[None, None, :] + t[..., None] * d_w
        ui = np.floor(p_w[..., 0] / self.cell).astype(np.int64) % self.tex.shape[0]
        vi = np.floor(p_w[..., 1] / self.cell).astype(np.int64) % self.tex.shape[1]
        rgb = self.tex[vi, ui]
        rgb = np.where(hit[..., None], rgb, 0).astype(np.uint8)
        depth_raw = np.where(hit, t * self.depth_scale, 0.0)
        depth = np.clip(depth_raw, 0, 65535).astype(np.uint16)
        return SyntheticFrame(rgb=rgb, depth=depth, timestamp=float(timestamp), T_c_w=np.asarray(T_c_w, float))


def orbit_trajectory(n_frames: int, step_t=(0.02, 0.004, 0.0), step_r=(0.0, 0.0, 0.004)):
    """Ground-truth T_c_w sequence: constant-velocity lateral drift + yaw.

    Defaults move ~2 cm/frame so every few frames crosses the reference's
    keyframe threshold (0.05 m / 0.05 rad, config/default.yaml:24-25).
    """
    poses = [make_pose([0.0, 0, 0], [0.0, 0, 0])]
    dq = _rotvec_to_quat(np.asarray(step_r, float))
    dt = np.asarray(step_t, float)
    for _ in range(n_frames - 1):
        prev = poses[-1]
        q = _quat_mul(dq, prev[:4])
        q /= np.linalg.norm(q)
        t = _quat_rotate(dq, prev[4:7][None])[0] + dt
        poses.append(np.concatenate([q, t]))
    return poses


def generate_sequence(n_frames: int, fps: float = 30.0, scene: SyntheticScene | None = None, **traj_kw):
    scene = scene or SyntheticScene()
    frames = []
    for i, T in enumerate(orbit_trajectory(n_frames, **traj_kw)):
        frames.append(scene.render(T, timestamp=i / fps))
    return frames
