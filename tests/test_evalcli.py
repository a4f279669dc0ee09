"""Evaluation CLI + trajectory-overlay tool tests."""

import numpy as np

from rgbd_visualodometry_tpu.evaltools import cli as eval_cli
from rgbd_visualodometry_tpu.evaltools.plot_trajectory import (
    draw_axes_into_image,
    plot_trajectory_sequence,
)
from rgbd_visualodometry_tpu.io.trajectory import TrajectoryWriter


def write_traj(path, n=30, vel=0.01, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    ts = np.arange(n) / 30.0
    with TrajectoryWriter(path) as w:
        for i, t in enumerate(ts):
            pose = np.array([1.0, 0, 0, 0, vel * i, 0, 0])
            if noise:
                pose[4:] += rng.normal(0, noise, 3)
            w.write(t, pose)
    return ts


def test_ate_cli(tmp_path, capsys):
    gt = str(tmp_path / "gt.txt")
    est = str(tmp_path / "est.txt")
    write_traj(gt)
    write_traj(est, noise=0.004, seed=1)
    assert eval_cli.main(["ate", gt, est, "--verbose"]) == 0
    out = capsys.readouterr().out
    assert "compared_pose_pairs 30 pairs" in out
    rmse = float([l for l in out.splitlines() if ".rmse" in l][0].split()[1])
    assert 0.001 < rmse < 0.02


def test_rpe_cli(tmp_path, capsys):
    gt = str(tmp_path / "gt.txt")
    est = str(tmp_path / "est.txt")
    write_traj(gt, n=90)
    write_traj(est, n=90, vel=0.012)  # 20% velocity error
    assert eval_cli.main(["rpe", gt, est, "--delta", "1.0", "--verbose"]) == 0
    out = capsys.readouterr().out
    assert "translational_error.rmse" in out
    # without --verbose the reference prints only the mean translational
    # error (evaluate_rpe.py:368)
    assert eval_cli.main(["rpe", gt, est, "--delta", "1.0"]) == 0
    bare = capsys.readouterr().out.strip().splitlines()
    assert len(bare) == 1 and 0 < float(bare[0]) < 1


def test_associate_cli(tmp_path, capsys):
    a = tmp_path / "rgb.txt"
    b = tmp_path / "depth.txt"
    a.write_text("1.00 rgb/1.png\n2.00 rgb/2.png\n")
    b.write_text("1.01 depth/1.png\n2.05 depth/2.png\n")
    assert eval_cli.main(["associate", str(a), str(b)]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1  # 2.05 outside the 0.02 window
    assert "rgb/1.png" in lines[0] and "depth/1.png" in lines[0]


def test_draw_axes():
    rgb = np.zeros((100, 120, 3), np.uint8)
    cur = np.array([1.0, 0, 0, 0, 0, 0, 0])
    other = np.array([1.0, 0, 0, 0, 0.0, 0.0, 1.5])
    img = draw_axes_into_image(rgb, cur, other[None], 100, 100, 60, 50, axis_length=0.3)
    assert (img != 0).any()
    # all three axis colors present
    present = {tuple(c) for c in img[(img != 0).any(axis=-1)]}
    assert {(255, 0, 0), (0, 255, 0), (0, 0, 255)} <= present


def test_plot_sequence(tmp_path):
    rgb = np.zeros((60, 80, 3), np.uint8)
    poses = np.stack(
        [np.array([1.0, 0, 0, 0, 0.05 * i, 0, 0]) for i in range(3)]
    )
    out = plot_trajectory_sequence(
        np.array([0.0, 0.1, 0.2]), poses,
        [(0.0, rgb), (0.1, rgb), (0.2, rgb)],
        str(tmp_path), 100, 100, 40, 30,
    )
    assert len(out) == 3
    import os

    assert all(os.path.getsize(p) > 0 for p in out)
