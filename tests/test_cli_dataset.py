"""End-to-end CLI test over a real on-disk TUM-layout dataset: PNG decode
(native loader), association, tracking, trajectory writing, evaluation -
the full ``run_vo`` path (``app/run_vo.cpp:27-134``) without any downloads."""

import os

import cv2
import numpy as np
import pytest

from rgbd_visualodometry_tpu.io import synthetic


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """A miniature TUM dataset rendered from the synthetic scene."""
    d = tmp_path_factory.mktemp("tum_seq")
    (d / "rgb").mkdir()
    (d / "depth").mkdir()
    scene = synthetic.SyntheticScene(
        width=320, height=240, fx=258.6, fy=258.2, cx=159.3, cy=127.6
    )
    seq = synthetic.generate_sequence(8, scene=scene)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for f in seq:
        ts = f"{f.timestamp:.6f}"
        cv2.imwrite(str(d / "rgb" / f"{ts}.png"), f.rgb[..., ::-1])
        cv2.imwrite(str(d / "depth" / f"{ts}.png"), f.depth)
        rgb_lines.append(f"{ts} rgb/{ts}.png")
        depth_lines.append(f"{ts} depth/{ts}.png")
        T_w_c = synthetic._pose_inverse(f.T_c_w)
        q, t = T_w_c[:4], T_w_c[4:7]
        gt_lines.append(
            f"{ts} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}"
        )
    (d / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (d / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (d / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return d


def small_yaml(tmp_path, dataset_dir, output):
    """Config in the reference's YAML format + native extra keys."""
    text = f"""%YAML:1.0
dataset_dir: {dataset_dir}
output_file: {output}
camera.fx: 258.6
camera.fy: 258.2
camera.cx: 159.3
camera.cy: 127.6
camera.depth_scale: 5000
number_of_features: 300
scale_factor: 1.2
level_pyramid: 4
match_ratio: 2.0
max_num_lost: 10
min_inliers: 10
keyframe_rotation: 0.05
keyframe_translation: 0.05
enable_local_optimization: 1
chi2_th: 1
enable_viewer: 0
image_width: 320
image_height: 240
max_keyframes: 32
max_mappoints: 4096
max_obs_per_mappoint: 8
pnp_max_points: 512
triangulation_batch: 256
ransac_hypotheses: 64
ba_max_poses: 8
ba_max_points: 2048
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(text)
    return str(p)


def test_cli_end_to_end_on_disk_dataset(tmp_path, tum_dir):
    from rgbd_visualodometry_tpu import cli

    out = str(tmp_path / "out" / "traj.txt")
    cfg_path = small_yaml(tmp_path, str(tum_dir), out)
    rc = cli.main([cfg_path, "--quiet", "--evaluate", str(tum_dir / "groundtruth.txt")])
    assert rc == 0
    assert os.path.exists(out)

    from rgbd_visualodometry_tpu.evaltools import absolute_trajectory_error
    from rgbd_visualodometry_tpu.io.trajectory import read_trajectory

    est_ts, est = read_trajectory(out)
    gt_ts, gt = read_trajectory(str(tum_dir / "groundtruth.txt"))
    assert len(est_ts) == 8
    ate = absolute_trajectory_error(est_ts, est[:, 4:7], gt_ts, gt[:, 4:7])
    assert ate.rmse < 0.02, f"ATE {ate.rmse * 100:.2f} cm"


def test_cli_save_and_load_map(tmp_path, tum_dir):
    from rgbd_visualodometry_tpu import cli

    out = str(tmp_path / "t.txt")
    ckpt = str(tmp_path / "map.npz")
    cfg_path = small_yaml(tmp_path, str(tum_dir), out)
    assert cli.main([cfg_path, "--quiet", "--max-frames", "4", "--save-map", ckpt]) == 0
    assert os.path.getsize(ckpt) > 1000
    # resume and continue on the remaining frames
    assert cli.main([cfg_path, "--quiet", "--load-map", ckpt]) == 0


def test_cli_localize_only(tmp_path, tum_dir):
    """Map once, then localize against the frozen map from a kidnapped
    start (--load-map --localize-only): every frame tracked, map untouched."""
    from rgbd_visualodometry_tpu import cli
    from rgbd_visualodometry_tpu.evaltools import absolute_trajectory_error
    from rgbd_visualodometry_tpu.io.checkpoint import load_state
    from rgbd_visualodometry_tpu.io.trajectory import read_trajectory

    out = str(tmp_path / "map_run.txt")
    ckpt = str(tmp_path / "prior_map.npz")
    cfg_path = small_yaml(tmp_path, str(tum_dir), out)
    assert cli.main([cfg_path, "--quiet", "--save-map", ckpt]) == 0

    loc_out = str(tmp_path / "loc_run.txt")
    loc_ckpt = str(tmp_path / "after_loc.npz")
    rc = cli.main(
        [cfg_path, "--quiet", "--load-map", ckpt, "--localize-only",
         "--output", loc_out, "--save-map", loc_ckpt]
    )
    assert rc == 0
    est_ts, est = read_trajectory(loc_out)
    gt_ts, gt = read_trajectory(str(tum_dir / "groundtruth.txt"))
    assert len(est_ts) == 8  # relocalized on frame 0, tracked all frames
    ate = absolute_trajectory_error(est_ts, est[:, 4:7], gt_ts, gt[:, 4:7])
    assert ate.rmse < 0.02, f"localization ATE {ate.rmse * 100:.2f} cm"
    # the frozen map came out exactly as it went in
    before, _ = load_state(ckpt)
    after, _ = load_state(loc_ckpt)
    np.testing.assert_array_equal(np.asarray(before.kf_valid), np.asarray(after.kf_valid))
    np.testing.assert_array_equal(np.asarray(before.mp_valid), np.asarray(after.mp_valid))
    np.testing.assert_array_equal(np.asarray(before.mp_pos), np.asarray(after.mp_pos))
