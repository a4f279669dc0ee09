"""Golden-trajectory integration tests: the full VO system on synthetic
RGB-D sequences with exact ground truth (the test the reference never had -
SURVEY.md section 4 'implication').
"""

import numpy as np
import pytest

from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.evaltools import absolute_trajectory_error
from rgbd_visualodometry_tpu.io import synthetic
from rgbd_visualodometry_tpu.mapstate import LOST, TRACKING
from rgbd_visualodometry_tpu.pipeline.system import VisualOdometry


def small_cfg(**kw):
    base = dict(
        image_width=320, image_height=240,
        camera_fx=258.6, camera_fy=258.2, camera_cx=159.3, camera_cy=127.6,
        number_of_features=300, level_pyramid=4,
        max_keyframes=32, max_mappoints=4096, max_obs_per_mappoint=8,
        pnp_max_points=512, triangulation_batch=256, ransac_hypotheses=64,
        ba_max_poses=8, ba_max_points=2048,
    )
    base.update(kw)
    return VOConfig(**base)


@pytest.fixture(scope="module")
def scene():
    return synthetic.SyntheticScene(
        width=320, height=240, fx=258.6, fy=258.2, cx=159.3, cy=127.6
    )


def run_sequence(cfg, seq):
    vo = VisualOdometry(cfg)
    results = vo.run(((f.rgb, f.depth, f.timestamp) for f in seq))
    return vo, results


def ate_of(results, seq):
    est_ts = np.asarray([r.timestamp for r in results if r.tracked])
    est_xyz = np.asarray([r.pose_w_c[4:7] for r in results if r.tracked])
    gt_ts = np.asarray([f.timestamp for f in seq])
    gt_xyz = np.asarray([synthetic._pose_inverse(f.T_c_w)[4:7] for f in seq])
    return absolute_trajectory_error(est_ts, est_xyz, gt_ts, gt_xyz)


def test_tracks_synthetic_sequence(scene):
    cfg = small_cfg()
    seq = synthetic.generate_sequence(15, scene=scene)
    vo, results = run_sequence(cfg, seq)
    assert all(r.tracked for r in results)
    assert results[-1].fsm == TRACKING
    assert sum(r.is_keyframe for r in results) >= 2
    ate = ate_of(results, seq)
    assert ate.rmse < 0.02, f"ATE {ate.rmse * 100:.2f} cm"
    snap = vo.map_snapshot()
    assert snap["mappoints"].shape[0] > 300
    assert snap["num_keyframes"] >= 3


def test_frontend_only_mode(scene):
    """BASELINE config 1: no backend (enable_local_optimization=0,
    run_vo.cpp:82-86)."""
    cfg = small_cfg(enable_local_optimization=False)
    seq = synthetic.generate_sequence(10, scene=scene)
    vo, results = run_sequence(cfg, seq)
    assert all(r.tracked for r in results)
    assert ate_of(results, seq).rmse < 0.03


def test_coarse_round_lightening_tracks(scene):
    """Throughput knobs: a lighter coarse round (fewer RANSAC lanes, fewer
    LM iterations) must still track accurately - the fine round re-runs the
    full search from the coarse pose (frontend.cpp:100-108 semantics)."""
    cfg = small_cfg(coarse_ransac_hypotheses=16, coarse_pose_ba_iterations=4)
    seq = synthetic.generate_sequence(15, scene=scene)
    vo, results = run_sequence(cfg, seq)
    assert all(r.tracked for r in results)
    ate = ate_of(results, seq)
    assert ate.rmse < 0.02, f"ATE {ate.rmse * 100:.2f} cm"


def test_goes_lost_on_garbage_and_stays_lost(scene):
    """Strict reference behavior: LOST is terminal (LostHandler,
    frontend.cpp:146-148) when relocalization is disabled."""
    cfg = small_cfg(max_num_lost=2, enable_relocalization=False)
    seq = synthetic.generate_sequence(3, scene=scene)
    vo = VisualOdometry(cfg)
    for f in seq:
        vo.process(f.rgb, f.depth, f.timestamp)
    assert not vo.lost
    black_rgb = np.zeros((240, 320, 3), np.uint8)
    black_depth = np.zeros((240, 320), np.uint16)
    for i in range(5):
        res = vo.process(black_rgb, black_depth, 1.0 + i)
        if res.fsm == LOST:
            break
    assert vo.lost
    res = vo.process(seq[0].rgb, seq[0].depth, 99.0)
    assert res.fsm == LOST and not res.tracked


def test_relocalization_recovers_from_lost(scene):
    """Net-new capability: with relocalization on (default), a LOST tracker
    re-enters TRACKING when known content reappears, with a correct pose."""
    cfg = small_cfg(max_num_lost=2)
    seq = synthetic.generate_sequence(4, scene=scene)
    vo = VisualOdometry(cfg)
    for f in seq:
        vo.process(f.rgb, f.depth, f.timestamp)
    black = np.zeros((240, 320, 3), np.uint8)
    for i in range(5):
        res = vo.process(black, np.zeros((240, 320), np.uint16), 1.0 + i)
        if res.fsm == LOST:
            break
    assert vo.lost
    # revisit a known view (frame 1's pose)
    res = vo.process(seq[1].rgb, seq[1].depth, 99.0)
    assert res.fsm == TRACKING and res.tracked
    assert res.is_keyframe  # relocalized frame re-anchors the map
    err = np.linalg.norm(res.pose_c_w[4:] - seq[1].T_c_w[4:])
    assert err < 0.05, f"reloc pose error {err}"


def test_localization_only_frozen_map(scene):
    """Net-new capability: localization-only mode tracks against a frozen
    prior map from a kidnapped start (fsm=LOST, no pose prior) and never
    mutates it - no keyframes, no mappoints, no BA."""
    import jax.numpy as jnp

    from rgbd_visualodometry_tpu.mapstate import LOST as LOST_CODE
    from rgbd_visualodometry_tpu.ops import se3

    cfg = small_cfg()
    seq = synthetic.generate_sequence(15, scene=scene)
    vo, results = run_sequence(cfg, seq)
    assert all(r.tracked for r in results)
    n_kf = int(jnp.sum(vo.state.kf_valid))
    n_mp = int(jnp.sum(vo.state.mp_valid))
    num_kf_ctr = int(vo.state.num_kf)

    loc = VisualOdometry(cfg.replace(localization_only=True))
    # kidnapped start in the prior map (what `rgbd-vo --load-map X
    # --localize-only` sets up from a checkpoint)
    loc.state = vo.state._replace(
        fsm=jnp.int32(LOST_CODE),
        lost_count=jnp.int32(0),
        prev_pose=se3.identity(jnp.float32),
    )
    sub = seq[5:12]  # re-enter mid-sequence, away from the map origin
    res = [loc.process(f.rgb, f.depth, f.timestamp) for f in sub]
    assert res[0].fsm == TRACKING and res[0].tracked  # immediate reloc
    assert all(r.tracked for r in res)
    assert not any(r.is_keyframe for r in res)  # frozen map: no keyframes
    for r, f in zip(res, sub):
        err = np.linalg.norm(np.asarray(r.pose_c_w[4:]) - f.T_c_w[4:])
        assert err < 0.05, f"localization pose error {err}"
    assert int(jnp.sum(loc.state.kf_valid)) == n_kf
    assert int(jnp.sum(loc.state.mp_valid)) == n_mp
    assert int(loc.state.num_kf) == num_kf_ctr


@pytest.mark.parametrize(
    "fx,fy,cx,cy",
    [
        (260.45, 260.5, 162.55, 124.85),  # fr2-like intrinsics (halved)
        (267.7, 269.6, 160.2, 123.7),  # fr3-like intrinsics (halved)
    ],
)
def test_tracks_other_freiburg_intrinsics(fx, fy, cx, cy):
    """BASELINE config 4: the pipeline must work across fr1/fr2/fr3-style
    camera calibrations, not just the fr1 defaults."""
    cfg = small_cfg(camera_fx=fx, camera_fy=fy, camera_cx=cx, camera_cy=cy)
    sc = synthetic.SyntheticScene(width=320, height=240, fx=fx, fy=fy, cx=cx, cy=cy)
    seq = synthetic.generate_sequence(10, scene=sc)
    vo, results = run_sequence(cfg, seq)
    assert all(r.tracked for r in results)
    assert ate_of(results, seq).rmse < 0.03


def test_stats_mirror_reference_logs(scene):
    cfg = small_cfg()
    seq = synthetic.generate_sequence(6, scene=scene)
    vo, results = run_sequence(cfg, seq)
    s0 = results[0].stats  # initialization frame
    assert s0["num_new_mappoints"] > 100
    assert s0["num_keyframes"] == 1
    s1 = results[1].stats
    assert s1["num_matches"] > 30
    assert s1["num_inliers"] >= 10
    assert s1["num_candidates"] > 0


def test_single_compilation(scene):
    """The step function must compile exactly once for a whole sequence -
    branchy per-frame behavior (init/keyframe/lost) lives in masks, never in
    Python control flow that would retrace."""
    cfg = small_cfg()
    seq = synthetic.generate_sequence(8, scene=scene)
    vo = VisualOdometry(cfg)
    vo.run((f.rgb, f.depth, f.timestamp) for f in seq)
    assert vo._step._cache_size() == 1


def test_trajectory_file_written(tmp_path, scene):
    cfg = small_cfg()
    seq = synthetic.generate_sequence(5, scene=scene)
    vo = VisualOdometry(cfg)
    path = str(tmp_path / "traj.txt")
    vo.run(((f.rgb, f.depth, f.timestamp) for f in seq), trajectory_path=path)
    from rgbd_visualodometry_tpu.io.trajectory import read_trajectory

    ts, poses = read_trajectory(path)
    assert len(ts) == 5
    # first pose is identity (first frame is the world origin)
    np.testing.assert_allclose(poses[0], [1, 0, 0, 0, 0, 0, 0], atol=1e-6)


def test_long_sequence_past_keyframe_capacity(scene):
    """VERDICT missing item 5: run far past max_keyframes and assert no
    silent degradation - ring eviction keeps inserting, tracking survives,
    and the overflow flag never fires (it is a 'refuse'-policy signal)."""
    cfg = small_cfg(
        max_keyframes=8,  # tiny pool: ~20 keyframes expected over the run
        enable_local_optimization=False,
    )
    seq = synthetic.generate_sequence(
        90, scene=scene, step_t=(0.03, 0.004, 0.0), step_r=(0.0, 0.0, 0.006)
    )
    vo, results = run_sequence(cfg, seq)
    assert all(r.tracked for r in results)
    n_kf = sum(r.is_keyframe for r in results)
    assert n_kf > cfg.max_keyframes  # we really overflowed the pool
    assert not any(r.stats["kf_overflow"] for r in results)
    # keyframe inserts kept landing after overflow (ring recycled slots);
    # +1: the INITIALIZING frame inserts a keyframe but reports is_keyframe=0
    assert results[-1].stats["num_keyframes"] == n_kf + 1
    ate = ate_of(results, seq)
    # drift bound, not a precision claim: an 8-slot pool at 3 cm/frame is a
    # deliberately degraded stress config (~5 cm over 90 frames with the
    # round-3 sheared-texture renderer; was ~4.x cm on the round-2 texture)
    assert ate.rmse < 0.07, f"ATE {ate.rmse * 100:.2f} cm"


def test_refuse_policy_surfaces_overflow(scene):
    cfg = small_cfg(
        max_keyframes=4, keyframe_eviction="refuse",
        enable_local_optimization=False,
    )
    seq = synthetic.generate_sequence(
        40, scene=scene, step_t=(0.03, 0.004, 0.0), step_r=(0.0, 0.0, 0.006)
    )
    vo, results = run_sequence(cfg, seq)
    assert any(r.stats["kf_overflow"] for r in results)
    assert results[-1].stats["num_keyframes"] == 4


def test_staged_frames_match_numpy_path(scene):
    """put_frame + process_async(FrameInput, timestamp=...) must produce
    bit-identical results to the numpy upload path (the bench stages frames
    in HBM before timing, mirroring run_vo.cpp:91-109 where imread sits
    outside the per-frame timer)."""
    cfg = small_cfg()
    seq = synthetic.generate_sequence(10, scene=scene)

    vo_np = VisualOdometry(cfg)
    for f in seq:
        vo_np.process_async(f.rgb, f.depth, f.timestamp)
    vo_np.drain(0)

    vo_staged = VisualOdometry(cfg)
    staged = [(vo_staged.put_frame(f.rgb, f.depth, f.timestamp), f.timestamp) for f in seq]
    for fr, ts in staged:
        vo_staged.process_async(fr, timestamp=ts)
    vo_staged.drain(0)

    assert len(vo_np.results) == len(vo_staged.results)
    for a, b in zip(vo_np.results, vo_staged.results):
        assert a.timestamp == b.timestamp
        assert a.tracked == b.tracked
        np.testing.assert_array_equal(a.pose_w_c, b.pose_w_c)
        assert a.stats == b.stats


def test_tracks_hard_scene():
    """fr1-like difficulty (VERDICT r2 task 2): non-planar boxes, blobby
    depth holes + edge shadowing, z^2 depth noise, exposure flicker.  The
    depth 4-neighbor fallback, the non-coplanar PnP geometry and the robust
    gates all get exercised at realistic rates."""
    cfg = small_cfg()
    scene = synthetic.hard_scene(
        width=320, height=240, fx=258.6, fy=258.2, cx=159.3, cy=127.6, seed=2
    )
    seq = synthetic.generate_sequence(
        20, scene=scene, step_t=(0.012, 0.002, 0.0), step_r=(0.0, 0.0, 0.003)
    )
    vo, results = run_sequence(cfg, seq)
    tracked = sum(r.tracked for r in results)
    assert tracked >= len(seq) - 1, f"tracked only {tracked}/{len(seq)}"
    assert results[-1].fsm == TRACKING
    ate = ate_of(results, seq)
    assert ate.rmse < 0.05, f"hard-scene ATE {ate.rmse * 100:.2f} cm"


def test_survives_50pct_depth_dropout():
    """VERDICT r2 task 4 'done' criterion: tracking survives 50% depth
    dropout.  The depth-free RANSAC lanes (ops/pnp._gn_three_point) carry
    the pose hypotheses; the reference's P3P likewise needs no depth
    (src/frontend.cpp:238-241)."""
    cfg = small_cfg()
    scene = synthetic.SyntheticScene(
        width=320, height=240, fx=258.6, fy=258.2, cx=159.3, cy=127.6,
        seed=3, n_boxes=24, depth_dropout=0.5, edge_dropout=True,
    )
    seq = synthetic.generate_sequence(
        20, scene=scene, step_t=(0.012, 0.002, 0.0), step_r=(0.0, 0.0, 0.003)
    )
    vo, results = run_sequence(cfg, seq)
    tracked = sum(r.tracked for r in results)
    assert tracked >= len(seq) - 1, f"tracked only {tracked}/{len(seq)}"
    assert results[-1].fsm == TRACKING
    ate = ate_of(results, seq)
    assert ate.rmse < 0.08, f"50%-dropout ATE {ate.rmse * 100:.2f} cm"


def test_packed_matching_mode_tracks_identically(scene):
    """cfg.packed_matching drops the [C, 256] bipolar pool and matches
    straight from packed descriptors (ops/pallas_match).  Exact Hamming
    either way - tracking decisions and poses must be identical."""
    seq = synthetic.generate_sequence(10, scene=scene)
    vo_a, res_a = run_sequence(small_cfg(), seq)
    vo_b, res_b = run_sequence(small_cfg(packed_matching=True), seq)
    assert vo_b.state.mp_bip.shape[1] == 0  # pool leaf reclaimed
    for ra, rb in zip(res_a, res_b):
        assert ra.tracked == rb.tracked and ra.is_keyframe == rb.is_keyframe
        assert ra.stats["num_matches"] == rb.stats["num_matches"]
        np.testing.assert_allclose(ra.pose_w_c, rb.pose_w_c, atol=1e-6)
