"""Differential oracle tests against the reference's OWN evaluation tools.

The reference's offline tooling (``tools/associate.py``,
``tools/evaluate_ate.py``, ``tools/evaluate_rpe.py``) is pure Python, so the
strongest possible parity evidence is to RUN those scripts on randomized
trajectories and assert our evaluators print the same numbers.  The scripts
are executed read-only from the reference checkout as subprocesses; tests
skip if the checkout is absent.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from rgbd_visualodometry_tpu.evaltools import (
    absolute_trajectory_error,
    relative_pose_error,
)
from rgbd_visualodometry_tpu.io.trajectory import pose_to_tum_line
from rgbd_visualodometry_tpu.io.tum import associate, read_file_list

REF_TOOLS = "/root/reference/tools"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TOOLS), reason="reference checkout not available"
)

# the reference prints every statistic with %f (6 decimals); agreement is
# asserted to that printing quantum
PRINT_TOL = 1.5e-6


def _traj(seed: int, n: int = 80, noise: float = 0.004, drop: float = 0.0):
    """Random smooth trajectory with realistic TUM epoch stamps.

    Returns (timestamps [K], poses [K, 7] in (qw qx qy qz tx ty tz))."""
    rng = np.random.default_rng(seed)
    ts = np.arange(n) / 30.0 + 1305031100.0 + rng.uniform(0, 1e-3, n)
    yaw = np.cumsum(rng.normal(0.05, 0.01, n))
    pos = np.cumsum(rng.normal(0.01, 0.005, (n, 3)), axis=0)
    pos += rng.normal(0, noise, (n, 3))
    poses = np.zeros((n, 7))
    poses[:, 0] = np.cos(yaw / 2)
    poses[:, 3] = np.sin(yaw / 2)
    poses[:, 4:7] = pos
    keep = rng.uniform(size=n) >= drop
    keep[:2] = True
    return ts[keep], poses[keep]


def _write(path, ts, poses):
    with open(path, "w") as f:
        for t, p in zip(ts, poses):
            f.write(pose_to_tum_line(t, p) + "\n")


def _run_ref(script: str, *args: str) -> str:
    """Run a reference tool (cwd = tools dir so ``import associate`` works)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REF_TOOLS, script), *args],
        cwd=REF_TOOLS,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def _parse_stats(out: str) -> dict:
    stats = {}
    for line in out.splitlines():
        parts = line.split()
        if len(parts) >= 2 and ("error." in parts[0] or parts[0].startswith("compared")):
            stats[parts[0]] = float(parts[1])
    return stats


@pytest.mark.parametrize("seed,drop", [(0, 0.0), (1, 0.15), (2, 0.0)])
def test_ate_matches_reference_tool(tmp_path, seed, drop):
    gt_ts, gt = _traj(seed, n=90)
    est_ts, est = _traj(seed + 100, n=90, drop=drop)
    # the estimate must share the gt's stamps (associable) but differ in pose
    est_ts = gt_ts.copy()[: len(est_ts)]
    gt_f, est_f = str(tmp_path / "gt.txt"), str(tmp_path / "est.txt")
    _write(gt_f, gt_ts, gt)
    _write(est_f, est_ts, est)

    ref = _parse_stats(_run_ref("evaluate_ate.py", gt_f, est_f, "--verbose"))
    res = absolute_trajectory_error(est_ts, est[:, 4:7], gt_ts, gt[:, 4:7])

    assert ref["compared_pose_pairs"] == res.num_pairs
    for key, ours in [
        ("absolute_translational_error.rmse", res.rmse),
        ("absolute_translational_error.mean", res.mean),
        ("absolute_translational_error.median", res.median),
        ("absolute_translational_error.std", res.std),
        ("absolute_translational_error.min", res.min),
        ("absolute_translational_error.max", res.max),
    ]:
        assert abs(ref[key] - ours) <= PRINT_TOL, (key, ref[key], ours)


def test_ate_offset_matches_reference_tool(tmp_path):
    """--offset is added to the ESTIMATE's stamps (evaluate_ate.py:120);
    trajectories half a second apart only associate under offset 0.5."""
    gt_ts, gt = _traj(9, n=60)
    est = gt.copy()
    est[:, 4:7] += np.random.default_rng(10).normal(0, 0.003, (len(gt), 3))
    est_ts = gt_ts - 0.5  # estimate clock runs half a second early
    gt_f, est_f = str(tmp_path / "gt.txt"), str(tmp_path / "est.txt")
    _write(gt_f, gt_ts, gt)
    _write(est_f, est_ts, est)

    ref = _parse_stats(
        _run_ref("evaluate_ate.py", gt_f, est_f, "--verbose", "--offset", "0.5")
    )
    res = absolute_trajectory_error(
        est_ts, est[:, 4:7], gt_ts, gt[:, 4:7], offset=0.5
    )
    assert ref["compared_pose_pairs"] == res.num_pairs == len(gt_ts)
    assert abs(ref["absolute_translational_error.rmse"] - res.rmse) <= PRINT_TOL


def test_ate_scale_matches_reference_tool(tmp_path):
    gt_ts, gt = _traj(3, n=60)
    est = gt.copy()
    est[:, 4:7] = est[:, 4:7] / 1.3 + np.random.default_rng(4).normal(
        0, 0.003, (len(gt), 3)
    )
    gt_f, est_f = str(tmp_path / "gt.txt"), str(tmp_path / "est.txt")
    _write(gt_f, gt_ts, gt)
    _write(est_f, gt_ts, est)

    ref = _parse_stats(
        _run_ref("evaluate_ate.py", gt_f, est_f, "--verbose", "--scale", "1.3")
    )
    res = absolute_trajectory_error(
        gt_ts, est[:, 4:7], gt_ts, gt[:, 4:7], scale=1.3
    )
    assert abs(ref["absolute_translational_error.rmse"] - res.rmse) <= PRINT_TOL


def _rpe_script_py3(tmp_path) -> str:
    """Path to a python3-runnable copy of the reference's evaluate_rpe.py.

    The script is py2: ``distances_along_trajectory`` /
    ``rotations_along_trajectory`` call ``dict_keys.sort()``
    (``tools/evaluate_rpe.py:179-180,193-194``), which crashes under py3 and
    blocks the "m"/"rad"/"deg" delta units.  This pins exactly those two
    crashing lines (``keys.sort()`` -> ``keys = sorted(keys)``) and changes
    nothing else, so the copy remains a faithful oracle.
    """
    src = open(os.path.join(REF_TOOLS, "evaluate_rpe.py")).read()
    assert src.count("    keys.sort()") == 2
    patched = src.replace("    keys.sort()", "    keys = sorted(keys)")
    out = str(tmp_path / "evaluate_rpe_py3.py")
    with open(out, "w") as f:
        f.write(patched)
    return out


# all five delta units of evaluate_rpe.py:243-252; "m"/"rad"/"deg" run the
# py3-pinned copy (see _rpe_script_py3), "s"/"f" run the pristine script
@pytest.mark.parametrize(
    "unit,delta",
    [("s", 1.0), ("f", 5.0), ("m", 0.3), ("rad", 0.5), ("deg", 25.0)],
)
def test_rpe_fixed_delta_matches_reference_tool(tmp_path, unit, delta):
    gt_ts, gt = _traj(5, n=90)
    est = gt.copy()
    rng = np.random.default_rng(6)
    est[:, 4:7] += rng.normal(0, 0.004, (len(gt), 3))
    gt_f, est_f = str(tmp_path / "gt.txt"), str(tmp_path / "est.txt")
    _write(gt_f, gt_ts, gt)
    _write(est_f, gt_ts, est)

    script = (
        "evaluate_rpe.py" if unit in ("s", "f") else _rpe_script_py3(tmp_path)
    )
    ref = _parse_stats(
        _run_ref(
            script, gt_f, est_f, "--fixed_delta",
            "--delta", str(delta), "--delta_unit", unit, "--verbose",
        )
    )
    res = relative_pose_error(
        gt_ts, est, gt_ts, gt, delta=delta, delta_unit=unit, fixed_delta=True
    )
    assert ref["compared_pose_pairs"] == res.num_pairs, unit
    for key, ours in [
        ("translational_error.rmse", res.trans_rmse),
        ("translational_error.mean", res.trans_mean),
        ("translational_error.median", res.trans_median),
        ("translational_error.std", res.trans_std),
        ("translational_error.min", res.trans_min),
        ("translational_error.max", res.trans_max),
        ("rotational_error.rmse", np.degrees(res.rot_rmse)),
        ("rotational_error.mean", np.degrees(res.rot_mean)),
        ("rotational_error.median", np.degrees(res.rot_median)),
        ("rotational_error.std", np.degrees(res.rot_std)),
        ("rotational_error.min", np.degrees(res.rot_min)),
        ("rotational_error.max", np.degrees(res.rot_max)),
    ]:
        assert abs(ref[key] - ours) <= PRINT_TOL, (key, ref[key], ours)


def test_rpe_scale_matches_reference_tool(tmp_path):
    """--scale multiplies the estimate's relative motions (evaluate_rpe.py
    ``scale(ominus(...), s)``)."""
    gt_ts, gt = _traj(11, n=60)
    est = gt.copy()
    est[:, 4:7] = est[:, 4:7] / 1.25
    gt_f, est_f = str(tmp_path / "gt.txt"), str(tmp_path / "est.txt")
    _write(gt_f, gt_ts, gt)
    _write(est_f, gt_ts, est)

    ref = _parse_stats(
        _run_ref(
            "evaluate_rpe.py", gt_f, est_f, "--fixed_delta", "--verbose",
            "--scale", "1.25",
        )
    )
    res = relative_pose_error(gt_ts, est, gt_ts, gt, fixed_delta=True, scale=1.25)
    assert ref["compared_pose_pairs"] == res.num_pairs
    assert abs(ref["translational_error.rmse"] - res.trans_rmse) <= PRINT_TOL
    # a perfectly rescaled copy has ~zero relative error at the right scale
    assert res.trans_rmse < 1e-6


def test_associate_matches_reference_tool(tmp_path):
    rng = np.random.default_rng(7)
    t1 = np.sort(1305031100.0 + np.cumsum(rng.uniform(0.02, 0.05, 60)))
    t2 = np.sort(t1 + rng.normal(0, 0.012, 60))[rng.uniform(size=60) > 0.2]
    a = tmp_path / "first.txt"
    b = tmp_path / "second.txt"
    a.write_text("".join(f"{t:.6f} rgb/{i}.png\n" for i, t in enumerate(t1)))
    b.write_text("".join(f"{t:.6f} depth/{i}.png\n" for i, t in enumerate(t2)))

    out = _run_ref("associate.py", str(a), str(b), "--max_difference", "0.02")
    ref_pairs = set()
    for line in out.splitlines():
        p = line.split()
        if len(p) == 4:
            ref_pairs.add((round(float(p[0]), 6), round(float(p[2]), 6)))

    first = sorted(read_file_list(str(a)))
    second = sorted(read_file_list(str(b)))
    ours = {
        (round(first[i], 6), round(second[j], 6))
        for i, j in associate(first, second, max_difference=0.02)
    }
    assert ours == ref_pairs


def test_associate_cli_output_matches_reference_tool(tmp_path):
    """Line-exact CLI comparison, including --offset (the reference prints
    the second stamp minus the offset, associate.py:125) and --first_only."""
    from rgbd_visualodometry_tpu.evaltools.cli import main

    rng = np.random.default_rng(8)
    t1 = np.sort(1305031100.0 + np.cumsum(rng.uniform(0.02, 0.05, 40)))
    t2 = np.sort(t1 - 0.5 + rng.normal(0, 0.01, 40))[rng.uniform(size=40) > 0.15]
    a = tmp_path / "first.txt"
    b = tmp_path / "second.txt"
    a.write_text("".join(f"{t:.6f} rgb/{i}.png\n" for i, t in enumerate(t1)))
    b.write_text("".join(f"{t:.6f} depth/{i}.png\n" for i, t in enumerate(t2)))

    import contextlib
    import io

    for flags in ([], ["--first_only"]):
        args = [str(a), str(b), "--offset", "0.5", "--max_difference", "0.02", *flags]
        ref = _run_ref("associate.py", *args)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            assert main(["associate", *args]) == 0
        ref_rows = [line.split() for line in ref.splitlines()]
        our_rows = [line.split() for line in buf.getvalue().splitlines()]
        assert len(ref_rows) == len(our_rows) and len(ref_rows) > 10, flags
        for rr, orow in zip(ref_rows, our_rows):
            assert len(rr) == len(orow), flags
            for x, y in zip(rr, orow):
                try:
                    assert abs(float(x) - float(y)) <= PRINT_TOL
                except ValueError:
                    assert x == y
