"""Multi-device tests on the virtual 8-device CPU mesh (conftest.py):
data-parallel multi-stream tracking and tensor-parallel matching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.io import synthetic
from rgbd_visualodometry_tpu.ops import matching
from rgbd_visualodometry_tpu.parallel import (
    MultiStreamVO,
    make_mesh,
    sharded_match_descriptors,
)


def tiny_cfg():
    return VOConfig(
        image_width=128, image_height=96,
        camera_fx=100.0, camera_fy=100.0, camera_cx=64.0, camera_cy=48.0,
        number_of_features=64, level_pyramid=2, edge_threshold=16,
        max_keyframes=8, max_mappoints=512, max_obs_per_mappoint=4,
        pnp_max_points=128, triangulation_batch=64, ransac_hypotheses=16,
        tracking_map_min_points=10,
    )


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_multi_stream_tracking(mesh):
    cfg = tiny_cfg()
    vo = MultiStreamVO(cfg, n_streams=8, mesh=mesh)
    scene = synthetic.SyntheticScene(
        width=128, height=96, fx=100, fy=100, cx=64, cy=48, cell_size=0.12
    )
    seq = synthetic.generate_sequence(3, scene=scene)
    for f in seq:
        rgb = np.broadcast_to(f.rgb, (8,) + f.rgb.shape)
        depth = np.broadcast_to(f.depth, (8,) + f.depth.shape)
        out = vo.step(rgb, depth, np.full(8, f.timestamp))
    assert out.tracked.shape == (8,)
    assert bool(out.tracked.all())
    m = vo.aggregate_metrics(out)
    assert m["tracked_fraction"] == 1.0
    # states remain sharded over the mesh
    shardings = {str(x.sharding.spec) for x in jax.tree_util.tree_leaves(vo.states)}
    assert any("stream" in s for s in shardings)


def test_stream_count_must_divide(mesh):
    with pytest.raises(ValueError):
        MultiStreamVO(tiny_cfg(), n_streams=3, mesh=mesh)


def test_sharded_matching_equals_single_device(mesh):
    rng = np.random.default_rng(0)
    C, N = 512, 64
    cand_bits = rng.integers(0, 2, (C, 256)).astype(np.int8)
    kp_bits = rng.integers(0, 2, (N, 256)).astype(np.int8)
    # plant some near-duplicates so the adaptive gate is meaningful
    cand_bits[7] = kp_bits[3]
    cand_bits[100] = kp_bits[10] ^ (np.arange(256) < 4)
    cand_bip = jnp.asarray(cand_bits * 2 - 1, jnp.int8)
    kp_bip = jnp.asarray(kp_bits * 2 - 1, jnp.int8)
    cand_mask = jnp.ones(C, bool).at[5].set(False)
    kp_mask = jnp.ones(N, bool)

    ref = matching.match_descriptors(cand_bip, cand_mask, kp_bip, kp_mask)

    from jax.sharding import NamedSharding, PartitionSpec as P

    cand_sharded = jax.device_put(cand_bip, NamedSharding(mesh, P("stream")))
    mask_sharded = jax.device_put(cand_mask, NamedSharding(mesh, P("stream")))
    got = sharded_match_descriptors(mesh, cand_sharded, mask_sharded, kp_bip, kp_mask)

    np.testing.assert_array_equal(np.asarray(got.matched), np.asarray(ref.matched))
    np.testing.assert_array_equal(np.asarray(got.kp_index), np.asarray(ref.kp_index))
    np.testing.assert_array_equal(np.asarray(got.distance), np.asarray(ref.distance))
    assert int(got.min_distance) == int(ref.min_distance) == 0


def test_graft_entry_single_chip():
    import __graft_entry__

    fn, (state, frame) = __graft_entry__.entry()
    jitted = jax.jit(fn)
    state2, out = jitted(state, frame)
    jax.block_until_ready(out)
    assert int(out.fsm) in (0, 1)
    assert state2.kf_pose.shape == state.kf_pose.shape


def test_graft_entry_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_multistream_full_vo_with_backend():
    """Full-VO multistream: per-stream pred-masked vmapped local BA
    (bench phase 2 must measure the same workload as the baseline's
    enable_local_optimization=1 deployment)."""
    import numpy as np

    from rgbd_visualodometry_tpu.io import synthetic
    from rgbd_visualodometry_tpu.parallel import MultiStreamVO, make_mesh

    cfg = tiny_cfg().replace(
        enable_local_optimization=True, ba_min_frame_gap=0,
        ba_max_poses=4, ba_max_points=256,
    )
    mesh = make_mesh(2)
    vo = MultiStreamVO(cfg, n_streams=2, mesh=mesh)
    scenes = [
        synthetic.SyntheticScene(
            width=cfg.image_width, height=cfg.image_height,
            fx=cfg.camera_fx, fy=cfg.camera_fy, cx=cfg.camera_cx, cy=cfg.camera_cy,
            cell_size=0.12, seed=k,
        )
        for k in range(2)
    ]
    seqs = [
        synthetic.generate_sequence(
            10, scene=sc, step_t=(0.03, 0.004, 0.0), step_r=(0.0, 0.0, 0.006)
        )
        for sc in scenes
    ]
    for i in range(10):
        rgb = np.stack([s[i].rgb for s in seqs])
        depth = np.stack([s[i].depth for s in seqs])
        ts = np.asarray([s[i].timestamp for s in seqs])
        out = vo.step(rgb, depth, ts)
    vo.finish()
    assert bool(out.tracked.all())
    assert vo._frames_since_ba < 1 << 29  # BA actually dispatched
    m = vo.aggregate_metrics(out)
    assert m["tracked_fraction"] == 1.0


def test_multistream_staged_batches():
    """put_batch + step(FrameInput) equals the numpy step path."""
    from rgbd_visualodometry_tpu.io import synthetic
    from rgbd_visualodometry_tpu.parallel import MultiStreamVO

    mesh = make_mesh(1, devices=jax.devices()[:1])
    cfg = tiny_cfg()
    seqs = [
        synthetic.generate_sequence(
            6,
            scene=synthetic.SyntheticScene(
                width=cfg.image_width, height=cfg.image_height,
                fx=cfg.camera_fx, fy=cfg.camera_fy,
                cx=cfg.camera_cx, cy=cfg.camera_cy, seed=s,
            ),
        )
        for s in range(2)
    ]

    def batches():
        for i in range(6):
            rgb = np.stack([s[i].rgb for s in seqs])
            depth = np.stack([s[i].depth for s in seqs])
            ts = np.asarray([s[i].timestamp for s in seqs])
            yield rgb, depth, ts

    vo_a = MultiStreamVO(cfg, n_streams=2, mesh=mesh)
    outs_a = [vo_a.step(rgb, d, ts) for rgb, d, ts in batches()]
    vo_a.finish()

    vo_b = MultiStreamVO(cfg, n_streams=2, mesh=mesh)
    outs_b = [vo_b.step(vo_b.put_batch(rgb, d, ts)) for rgb, d, ts in batches()]
    vo_b.finish()

    for a, b in zip(outs_a, outs_b):
        np.testing.assert_array_equal(np.asarray(a.packed), np.asarray(b.packed))


def test_sharded_map_vo_matches_single_device(mesh):
    """ShardedMapVO (tensor-parallel map INSIDE the tracking step, VERDICT
    r2 task 6): tracking over an 8-way sharded mappoint pool must agree
    with the unsharded single-device pipeline - XLA may reorder reductions,
    so poses are compared to tolerance, discrete decisions exactly."""
    from rgbd_visualodometry_tpu.parallel import ShardedMapVO
    from rgbd_visualodometry_tpu.pipeline.system import VisualOdometry

    cfg = tiny_cfg()
    map_mesh = make_mesh(8, axis="map")
    scene = synthetic.SyntheticScene(
        width=128, height=96, fx=100, fy=100, cx=64, cy=48, cell_size=0.12
    )
    seq = synthetic.generate_sequence(5, scene=scene, step_t=(0.04, 0.01, 0.0))

    vo_ref = VisualOdometry(cfg)
    vo_tp = ShardedMapVO(cfg, map_mesh)
    for f in seq:
        r_ref = vo_ref.process(f.rgb, f.depth, f.timestamp)
        r_tp = vo_tp.process(f.rgb, f.depth, f.timestamp)
        assert r_tp.tracked == r_ref.tracked
        assert r_tp.is_keyframe == r_ref.is_keyframe
        np.testing.assert_allclose(
            r_tp.pose_w_c, r_ref.pose_w_c, atol=5e-4,
        )
    # the big pool leaves really are sharded over the map axis
    assert "map" in str(vo_tp.state.mp_bip.sharding.spec)
    assert "map" in str(vo_tp.state.obs_uv.sharding.spec)


def test_sharded_map_vo_capacity_must_divide(mesh):
    from rgbd_visualodometry_tpu.parallel import ShardedMapVO

    with pytest.raises(ValueError):
        ShardedMapVO(tiny_cfg().replace(max_mappoints=500), make_mesh(8, axis="map"))
