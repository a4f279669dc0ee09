"""Map-state invariants, especially incremental-incidence consistency:
A_inc must equal the scatter-rebuilt incidence after every mutation path
(creation, observation add, pruning, outlier recycling)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu import mapstate
from rgbd_visualodometry_tpu.pipeline import backend
from test_backend import build_scene_state, small_cfg


def assert_A_consistent(state):
    np.testing.assert_array_equal(
        np.asarray(mapstate.incidence(state)),
        np.asarray(mapstate.incidence_from_obs(state)),
    )


def test_incidence_consistency_after_build():
    cfg = small_cfg()
    cam, state, poses_true, pts_true = build_scene_state(cfg)
    assert_A_consistent(state)
    # sanity: 4 keyframes each observe 120 points
    assert int(mapstate.incidence(state).sum()) == 480


def test_incidence_consistency_after_ba_pruning():
    cfg = small_cfg()
    cam, state, poses_true, pts_true = build_scene_state(cfg)
    bad = jnp.asarray(
        [[80.0, -60.0], [-75.0, 90.0], [65.0, 70.0], [-80.0, -85.0]], jnp.float32
    )
    state = state._replace(obs_uv=state.obs_uv.at[:, :4, 0].add(bad.T))
    state2, out = jax.jit(functools.partial(backend.ba_step, cfg, cam))(state, jnp.int32(3))
    assert int(out.num_pruned) >= 4
    assert_A_consistent(state2)
    # pruned point's column cleared
    assert int(mapstate.incidence(state2)[:, 0].sum()) == 0


def test_incidence_consistency_after_generic_remove():
    cfg = small_cfg()
    cam, state, *_ = build_scene_state(cfg)
    M, C = state.obs_kf.shape
    rm = jnp.zeros((M, C), bool).at[1, 3].set(True).at[:, 5].set(True)
    state2 = mapstate.remove_observations(state, rm)
    assert_A_consistent(state2)
    assert bool(state2.mp_outlier[5])  # lost all observations
    assert not bool(state2.mp_outlier[3])


def test_outlier_slot_recycling_clears_state():
    cfg = small_cfg()
    cam, state, *_ = build_scene_state(cfg, n_pts=20)
    M, C = state.obs_kf.shape
    # remove all observations of point 2 -> outlier -> recyclable
    rm = jnp.zeros((M, C), bool).at[:, 2].set(True)
    state = mapstate.remove_observations(state, rm)
    assert bool(state.mp_outlier[2])
    # create one new mappoint: must land in slot 2 (first free)
    pos = jnp.asarray([[9.0, 9.0, 9.0]], jnp.float32)
    state2, _ = mapstate.create_mappoints(
        state, jnp.int32(1), pos,
        jnp.zeros((1, 8), jnp.uint32), jnp.zeros((1, 256), jnp.int8),
        jnp.asarray([[5.0, 5.0]], jnp.float32), jnp.ones(1, bool),
        jnp.zeros(3, jnp.float32), jnp.asarray(True),
    )
    assert not bool(state2.mp_outlier[2])
    np.testing.assert_allclose(np.asarray(state2.mp_pos[:, 2]), [9, 9, 9])
    assert int(state2.obs_valid[:, 2].sum()) == 1
    assert int(state2.obs_kf[0, 2]) == 1
    assert_A_consistent(state2)


def test_covisibility_weights_from_incidence():
    cfg = small_cfg()
    cam, state, *_ = build_scene_state(cfg, n_pts=50)
    W = mapstate.covisibility_weights(mapstate.incidence(state))
    # all 4 keyframes share all 50 points
    assert np.asarray(W[:4, :4]).tolist() == (np.full((4, 4), 50)).tolist()
    assert int(W[4:, :].sum()) == 0


# ---------------------------------------------------------------------------
# keyframe-pool capacity policies (net-new vs the reference's unbounded map)
# ---------------------------------------------------------------------------


def _fill_keyframes(state, n, eviction):
    for k in range(n):
        state, slot, inserted = mapstate.insert_keyframe(
            state,
            jnp.asarray([1.0, 0, 0, 0, 0.1 * k, 0, 0], jnp.float32),
            jnp.float32(k),
            jnp.asarray(True),
            eviction=eviction,
        )
    return state, slot, inserted


def test_insert_refuse_past_capacity():
    cfg = small_cfg()
    K = cfg.max_keyframes
    state = mapstate.init_state(cfg)
    state, slot, inserted = _fill_keyframes(state, K, "refuse")
    assert bool(inserted) and int(slot) == K - 1
    state, slot, inserted = _fill_keyframes(state, 1, "refuse")
    assert not bool(inserted)  # full pool refuses; caller sees the flag
    assert int(state.num_kf) == K


def test_insert_ring_eviction_recycles_oldest_and_pins_anchor():
    cfg = small_cfg()
    K = cfg.max_keyframes
    cam, state, poses_true, pts_true = build_scene_state(cfg)  # 4 KFs, obs
    # make point 7 observed ONLY by keyframes 1 and 2 (the ones evicted below)
    M, C = state.obs_kf.shape
    rm = jnp.zeros((M, C), bool).at[:, 7].set(state.obs_kf[:, 7] != 1)
    rm = rm.at[:, 7].set(rm[:, 7] & (state.obs_kf[:, 7] != 2))
    state = mapstate.remove_observations(state, rm)
    assert not bool(state.mp_outlier[7])
    n0 = int(state.num_kf)
    # fill to capacity and then two more: slots 1 and 2 get recycled
    for k in range(n0, K + 2):
        state, slot, inserted = mapstate.insert_keyframe(
            state,
            jnp.asarray([1.0, 0, 0, 0, 0.1 * k, 0, 0], jnp.float32),
            jnp.float32(k),
            jnp.asarray(True),
            eviction="ring",
        )
        assert bool(inserted)
    assert int(state.num_kf) == K + 2
    assert int(slot) == 2  # second recycled slot; slot 0 never evicted
    # evicted keyframes' observations are gone, incidence stays consistent
    assert int(jnp.sum(state.obs_kf[state.obs_valid] == 1)) == 0
    assert int(jnp.sum(state.obs_kf[state.obs_valid] == 2)) == 0
    assert_A_consistent(state)
    # the point observed ONLY by evicted keyframes became outlier (recyclable)
    assert bool(state.mp_outlier[7])


def test_create_mappoints_reports_drops_when_pool_full():
    cfg = small_cfg()
    state = mapstate.init_state(cfg)
    C = cfg.max_mappoints
    n = 16
    pos = jnp.ones((n, 3), jnp.float32)
    state = state._replace(
        mp_valid=jnp.ones(C, bool), mp_outlier=jnp.zeros(C, bool)
    )  # saturate the pool
    state, created = mapstate.create_mappoints(
        state, jnp.int32(0), pos,
        jnp.zeros((n, 8), jnp.uint32), jnp.zeros((n, 256), jnp.int8),
        jnp.zeros((n, 2), jnp.float32), jnp.ones(n, bool),
        jnp.zeros(3, jnp.float32), jnp.asarray(True),
    )
    assert int(created) == 0
