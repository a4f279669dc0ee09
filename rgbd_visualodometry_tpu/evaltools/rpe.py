"""Relative pose error over pose pairs.

Metric contract of the reference's ``tools/evaluate_rpe.py`` (run with
``--fixed_delta --delta 1.0 --delta_unit s`` by ``tools/run_rpe.sh:5-8``):
for pose pairs (i, j) one time-delta apart, the error motion is

    E_ij = (Q_i^-1 Q_j)^-1 (P_i^-1 P_j)        (evaluate_rpe.py:138-149)

with translational error ``||trans(E)||`` and rotational error
``angle(E)``; in random mode at most ``max_pairs`` (10000) samples.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


def _quat_to_matrix(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _pose_to_matrix(pose7):
    """(qw qx qy qz tx ty tz) -> 4x4 homogeneous matrix."""
    M = np.eye(4)
    M[:3, :3] = _quat_to_matrix(np.asarray(pose7[:4], np.float64))
    M[:3, 3] = pose7[4:7]
    return M


def _ominus(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Relative motion a^-1 b (evaluate_rpe.py:138-149)."""
    return np.linalg.inv(a) @ b


class RPEResult(NamedTuple):
    trans_rmse: float
    trans_mean: float
    trans_median: float
    rot_rmse: float  # radians
    rot_mean: float
    num_pairs: int


def relative_pose_error(
    est_ts: np.ndarray,
    est_poses: np.ndarray,  # [N, 7] T_w_c in (qw qx qy qz tx ty tz)
    gt_ts: np.ndarray,
    gt_poses: np.ndarray,
    delta: float = 1.0,
    max_pairs: int = 10000,
    max_difference: float = 0.02,
    seed: int = 0,
) -> RPEResult:
    """Fixed-delta RPE: for each estimated pose i, pair it with the pose
    whose timestamp is nearest ``t_i + delta`` (skipped when off by more
    than ``delta / 2``); ground-truth poses are associated by timestamp."""
    from rgbd_visualodometry_tpu.io.tum import associate

    pairs_gt = associate(est_ts, gt_ts, max_difference=max_difference)
    if len(pairs_gt) < 2:
        raise ValueError("trajectories do not overlap")
    ei = np.asarray([i for i, _ in pairs_gt])
    gi = np.asarray([j for _, j in pairs_gt])
    ts = np.asarray(est_ts)[ei]
    P = [_pose_to_matrix(p) for p in np.asarray(est_poses)[ei]]
    Q = [_pose_to_matrix(p) for p in np.asarray(gt_poses)[gi]]

    trans_err, rot_err = [], []
    for i in range(len(ts)):
        target = ts[i] + delta
        j = int(np.argmin(np.abs(ts - target)))
        if j == i or abs(ts[j] - target) > delta / 2:
            continue
        E = _ominus(_ominus(Q[i], Q[j]), _ominus(P[i], P[j]))
        trans_err.append(np.linalg.norm(E[:3, 3]))
        rot_err.append(
            np.arccos(np.clip((np.trace(E[:3, :3]) - 1.0) / 2.0, -1.0, 1.0))
        )
    if not trans_err:
        raise ValueError("no pose pairs at the requested delta")
    if len(trans_err) > max_pairs:
        rng = np.random.default_rng(seed)
        sel = rng.choice(len(trans_err), max_pairs, replace=False)
        trans_err = np.asarray(trans_err)[sel]
        rot_err = np.asarray(rot_err)[sel]
    trans_err = np.asarray(trans_err)
    rot_err = np.asarray(rot_err)
    return RPEResult(
        trans_rmse=float(np.sqrt(np.mean(trans_err**2))),
        trans_mean=float(np.mean(trans_err)),
        trans_median=float(np.median(trans_err)),
        rot_rmse=float(np.sqrt(np.mean(rot_err**2))),
        rot_mean=float(np.mean(rot_err)),
        num_pairs=len(trans_err),
    )
