"""IO + evaluation tool tests: association semantics, TUM trajectory format
round trip, ATE Horn alignment, RPE fixed-delta pairs."""

import numpy as np
import pytest

from rgbd_visualodometry_tpu.evaltools import (
    absolute_trajectory_error,
    horn_align,
    relative_pose_error,
)
from rgbd_visualodometry_tpu.io.trajectory import (
    TrajectoryWriter,
    pose_to_tum_line,
    read_trajectory,
)
from rgbd_visualodometry_tpu.io.tum import associate, read_file_list


def test_associate_greedy_nearest():
    first = [0.0, 1.0, 2.0]
    second = [0.015, 0.99, 2.5]
    m = associate(first, second, max_difference=0.02)
    assert m == [(0, 0), (1, 1)]  # 2.5 is out of window for 2.0


def test_associate_one_to_one():
    # two first-timestamps compete for one second-timestamp: nearest wins
    first = [0.0, 0.005]
    second = [0.006]
    m = associate(first, second, max_difference=0.02)
    assert m == [(1, 0)]


def test_associate_offset():
    first = [10.0]
    second = [9.5]
    assert associate(first, second, offset=0.5, max_difference=0.02) == [(0, 0)]
    assert associate(first, second, offset=0.0, max_difference=0.02) == []


def test_read_file_list(tmp_path):
    p = tmp_path / "rgb.txt"
    p.write_text("# comment\n1.0 rgb/1.png\n2.0 rgb/2.png extra\n")
    d = read_file_list(str(p))
    assert d == {1.0: ["rgb/1.png"], 2.0: ["rgb/2.png", "extra"]}


def test_tum_line_format():
    # T_w_c with identity rotation: quaternion written xyzw (run_vo.cpp:22-24)
    pose = np.array([1.0, 0, 0, 0, 1.5, -2.0, 0.25])
    line = pose_to_tum_line(1305031102.1758, pose)
    parts = line.split()
    assert len(parts) == 8
    assert [float(x) for x in parts[1:]] == [1.5, -2.0, 0.25, 0, 0, 0, 1.0]


def test_trajectory_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    poses = rng.standard_normal((5, 7))
    poses[:, :4] /= np.linalg.norm(poses[:, :4], axis=1, keepdims=True)
    ts = np.arange(5) * 0.1 + 100.0
    path = str(tmp_path / "out" / "traj.txt")
    with TrajectoryWriter(path) as w:
        for t, p in zip(ts, poses):
            w.write(t, p)
    ts2, poses2 = read_trajectory(path)
    np.testing.assert_allclose(ts2, ts, atol=1e-4)
    np.testing.assert_allclose(poses2, poses, atol=1e-6)


def test_horn_align_exact():
    rng = np.random.default_rng(1)
    from scipy.spatial.transform import Rotation

    R_true = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    t_true = np.array([1.0, -2.0, 3.0])
    data = rng.standard_normal((30, 3))
    model = (data - t_true) @ R_true  # R_true.T @ (data - t) per point
    R, t, res = horn_align(model, data)
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    assert res.max() < 1e-9


def test_ate_invariant_to_rigid_offset():
    """ATE must be ~0 for a rigidly-displaced copy of the trajectory and
    report the true residual scale for noisy ones."""
    rng = np.random.default_rng(2)
    ts = np.arange(50) * (1 / 30)
    gt = np.cumsum(rng.uniform(-0.02, 0.02, (50, 3)), axis=0)
    est = gt @ np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]).T + [5, 5, 5]
    ate = absolute_trajectory_error(ts, est, ts, gt)
    assert ate.rmse < 1e-9
    est2 = est + rng.normal(0, 0.01, est.shape)
    ate2 = absolute_trajectory_error(ts, est2, ts, gt)
    assert 0.005 < ate2.rmse < 0.03
    assert ate2.num_pairs == 50


def test_rpe_detects_drift():
    """A trajectory with constant velocity error shows up in RPE at 1 s."""
    ts = np.arange(0, 10, 1 / 30)
    n = len(ts)
    gt = np.zeros((n, 7))
    gt[:, 0] = 1.0  # identity rotations
    gt[:, 4] = np.linspace(0, 1, n)  # moving 0.1 m/s in x
    est = gt.copy()
    est[:, 4] = np.linspace(0, 1.3, n)  # 30% velocity error -> 0.03 m / 1 s
    rpe = relative_pose_error(ts, est, ts, gt, delta=1.0)
    assert rpe.trans_rmse == pytest.approx(0.03, rel=0.05)
    assert rpe.rot_rmse < 1e-9
    assert rpe.num_pairs > 200


def test_rpe_perfect():
    ts = np.arange(0, 5, 1 / 30)
    n = len(ts)
    rng = np.random.default_rng(3)
    poses = np.zeros((n, 7))
    poses[:, 0] = 1.0
    poses[:, 4:7] = np.cumsum(rng.uniform(-0.01, 0.01, (n, 3)), axis=0)
    rpe = relative_pose_error(ts, poses, ts, poses, delta=1.0)
    assert rpe.trans_rmse < 1e-12


def _circle_traj(n=60, dt=1.0 / 30.0, radius=1.0):
    """Planar circular trajectory with known per-frame motion."""
    ts = np.arange(n) * dt
    ang = 0.1 * np.arange(n)
    poses = []
    for a in ang:
        q = np.array([np.cos(a / 2), 0, 0, np.sin(a / 2)])  # yaw about z
        t = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        poses.append(np.concatenate([q, t]))
    return ts, np.asarray(poses)


def test_rpe_delta_units_frames_and_meters():
    ts, poses = _circle_traj()
    # delta of 1 frame: identical trajectories -> zero error in all units
    for unit, delta in (("f", 1.0), ("m", 0.1), ("rad", 0.1), ("deg", 5.7)):
        r = relative_pose_error(
            ts, poses, ts, poses, delta=delta, delta_unit=unit, fixed_delta=True
        )
        assert r.trans_rmse < 1e-9, unit
        assert r.rot_rmse < 1e-9, unit


def test_rpe_random_mode_covers_all_pairs_when_small():
    ts, poses = _circle_traj(n=20)
    noisy = poses.copy()
    noisy[:, 4:7] += np.random.default_rng(0).normal(0, 0.01, (len(ts), 3))
    r = relative_pose_error(ts, noisy, ts, poses, fixed_delta=False, max_pairs=0)
    assert r.num_pairs > 20 * 19 / 2  # all NxN pairs evaluated
    assert 0 < r.trans_rmse < 0.1
    assert r.trans_min <= r.trans_median <= r.trans_max


def test_rpe_random_mode_samples_capped():
    ts, poses = _circle_traj(n=200)
    r = relative_pose_error(ts, poses, ts, poses, fixed_delta=False, max_pairs=500)
    assert r.num_pairs <= 500


def _write_tum(path, ts, poses):
    from rgbd_visualodometry_tpu.io.trajectory import pose_to_tum_line

    with open(path, "w") as f:
        for t, p in zip(ts, poses):
            f.write(pose_to_tum_line(t, p) + "\n")


def test_eval_cli_ate_save_and_plot(tmp_path):
    """The reference's evaluate_ate.py --save/--save_associations/--plot
    surface (``tools/evaluate_ate.py:123-125``)."""
    from rgbd_visualodometry_tpu.evaltools.cli import main

    ts, poses = _circle_traj()
    noisy = poses.copy()
    noisy[:, 4:7] += np.random.default_rng(1).normal(0, 0.005, (len(ts), 3))
    gt_f, est_f = tmp_path / "gt.txt", tmp_path / "est.txt"
    _write_tum(gt_f, ts, poses)
    _write_tum(est_f, ts, noisy)
    save = tmp_path / "aligned.txt"
    assoc = tmp_path / "assoc.txt"
    png = tmp_path / "ate.png"
    rc = main(
        [
            "ate", str(gt_f), str(est_f), "--verbose",
            "--save", str(save), "--save_associations", str(assoc),
            "--plot", str(png),
        ]
    )
    assert rc == 0
    rows = np.loadtxt(save)
    assert rows.shape == (len(ts), 4)  # stamp x y z
    arows = np.loadtxt(assoc)
    assert arows.shape == (len(ts), 8)  # stamp1 xyz1 stamp2 xyz2
    # the aligned estimate sits within the noise scale of ground truth
    assert np.linalg.norm(arows[:, 1:4] - arows[:, 5:8], axis=1).max() < 0.05
    assert png.stat().st_size > 1000


def test_eval_cli_ate_scale(tmp_path):
    """--scale multiplies the estimate before alignment
    (``tools/evaluate_ate.py:121``): a half-scale copy aligns exactly at
    --scale 2."""
    from rgbd_visualodometry_tpu.evaltools.cli import main

    ts, poses = _circle_traj()
    half = poses.copy()
    half[:, 4:7] *= 0.5
    gt_f, est_f = tmp_path / "gt.txt", tmp_path / "est.txt"
    _write_tum(gt_f, ts, poses)
    _write_tum(est_f, ts, half)
    res = absolute_trajectory_error(ts, half[:, 4:7], ts, poses[:, 4:7], scale=2.0)
    assert res.rmse < 1e-9
    assert main(["ate", str(gt_f), str(est_f), "--scale", "2.0"]) == 0


def test_eval_cli_rpe_save_and_plot(tmp_path):
    """The reference's evaluate_rpe.py --save/--plot surface
    (``tools/evaluate_rpe.py:321-322``; --plot requires --fixed_delta)."""
    import pytest as _pytest

    from rgbd_visualodometry_tpu.evaltools.cli import main

    ts, poses = _circle_traj(n=90)
    noisy = poses.copy()
    noisy[:, 4:7] += np.random.default_rng(2).normal(0, 0.002, (len(ts), 3))
    gt_f, est_f = tmp_path / "gt.txt", tmp_path / "est.txt"
    _write_tum(gt_f, ts, poses)
    _write_tum(est_f, ts, noisy)
    save = tmp_path / "rpe.txt"
    png = tmp_path / "rpe.png"
    rc = main(
        [
            "rpe", str(gt_f), str(est_f), "--fixed_delta", "--delta", "1.0",
            "--save", str(save), "--plot", str(png),
        ]
    )
    assert rc == 0
    rows = np.loadtxt(save)
    assert rows.ndim == 2 and rows.shape[1] == 6
    assert (rows[:, 4] >= 0).all() and (rows[:, 5] >= 0).all()
    assert png.stat().st_size > 1000
    # --plot without --fixed_delta is rejected like the reference
    with _pytest.raises(SystemExit):
        main(["rpe", str(gt_f), str(est_f), "--plot", str(png)])
