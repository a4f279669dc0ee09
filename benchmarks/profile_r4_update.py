"""Round-4: block-level breakdown of the batched apply_updates half.

profile_r4_multistream measured the 72-stream step as compute 201 ms +
update 98.7 ms.  The update half is map bookkeeping over [C]-shaped pools -
this times each block (keyframe insert, observation writes, mappoint
creation, triangulation refinement) separately with a REAL TrackInter from
a warmed-up run, to find where the 98.7 ms goes.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from rgbd_visualodometry_tpu import mapstate
from rgbd_visualodometry_tpu.camera import Camera
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.ops import packing, triangulate
from rgbd_visualodometry_tpu import camera as cam_mod
from rgbd_visualodometry_tpu.parallel import MultiStreamVO, make_mesh
from rgbd_visualodometry_tpu.utils import enable_compilation_cache


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def main():
    enable_compilation_cache()
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 72
    cfg = bench.multistream_cfg(VOConfig(), full_vo=True)
    camera = Camera.from_config(cfg)
    C = cfg.max_mappoints

    seqs = [bench._make_frames(cfg, 14, seed=s) for s in range(S)]
    vo = MultiStreamVO(cfg, n_streams=S, mesh=make_mesh(1))
    batches = []
    for i in range(14):
        rgb = np.stack([sq[i].rgb for sq in seqs])
        depth = np.stack([sq[i].depth for sq in seqs])
        ts = np.asarray([sq[i].timestamp for sq in seqs])
        batches.append(vo.put_batch(rgb, depth, ts))
    jax.block_until_ready(batches)
    for fb in batches[:12]:
        vo.step(fb)
    vo.finish()
    jax.block_until_ready(vo.states)

    it = jax.block_until_ready(vo._compute(vo.states, batches[12]))
    state = vo.states

    # ---- blocks mirroring pipeline/frontend.apply_updates -----------------
    def blk_insert(state, it):
        pose_used = it.pose_used
        state = state._replace(rng=it.rng)
        state, kf_slot, inserted = mapstate.insert_keyframe(
            state, pose_used, it.timestamp, it.do_insert,
            eviction=cfg.keyframe_eviction,
        )
        return state, kf_slot, inserted

    def blk_obs(state, it, kf_slot, inserted):
        is_kf_eff = it.is_kf & inserted
        cam_center = cam_mod.camera_center(it.pose_used)
        inlier_packed = it.ref_inliers & it.mval
        inlier_mp, minv = packing.inverse_lookup(C, it.midx, inlier_packed)
        uv_for_mp = jnp.take(it.uv, minv, axis=0) * inlier_mp[:, None]
        kp_depth = jnp.take(it.depth, it.kpi) * jnp.take(it.depth_valid, it.kpi)
        depth_for_mp = jnp.take(kp_depth, minv) * inlier_mp
        return mapstate.add_observations(
            state, kf_slot, inlier_mp, uv_for_mp, cam_center, is_kf_eff,
            depth=depth_for_mp,
        )

    def blk_create(state, it, kf_slot, inserted):
        N = cfg.number_of_features
        cam_center = cam_mod.camera_center(it.pose_used)
        inlier_packed = it.ref_inliers & it.mval
        matched_kp = packing.scatter_back(
            N, jnp.where(inlier_packed, it.kpi, N), inlier_packed
        )
        create_mask = it.kp_valid & it.depth_valid & ~(matched_kp & ~it.is_init)
        p_world_new = cam_mod.pixel2world(camera, it.xy, it.pose_used, it.depth)
        state, n_created = mapstate.create_mappoints(
            state, kf_slot, p_world_new, it.desc, it.bip, it.xy,
            create_mask, cam_center, inserted, depth=it.depth,
        )
        return state, n_created

    def blk_tri(state, it, inserted):
        is_kf_eff = it.is_kf & inserted
        inlier_packed = it.ref_inliers & it.mval
        inlier_mp, _ = packing.inverse_lookup(C, it.midx, inlier_packed)
        tri_cand = (
            it.tmap & inlier_mp & ~state.mp_triangulated
            & ~state.mp_optimized & ~state.mp_outlier
        )
        tidx, tval = packing.compact_indices(tri_cand, cfg.triangulation_batch)
        obs_kf = jnp.take(state.obs_kf, tidx, axis=0)
        obs_uv = jnp.take(state.obs_uv, tidx, axis=0)
        obs_ok = jnp.take(state.obs_valid, tidx, axis=0) & tval[:, None]
        poses_obs = jnp.take(state.kf_pose, jnp.clip(obs_kf, 0, None), axis=0)
        norm_xy = cam_mod.pixel2camera(camera, obs_uv, 1.0)[..., :2]
        tri = triangulate.triangulate(
            poses_obs, norm_xy, obs_ok, cfg.triangulation_sv_ratio,
            cfg.triangulation_min_obs, min_baseline=cfg.triangulation_min_baseline,
        )
        tri_ok = tval & tri.ok & (tri.points[:, 2] > 0) & is_kf_eff
        thit, tinv = packing.inverse_lookup(C, tidx, tri_ok)
        return state._replace(
            mp_pos=jnp.where(
                thit[:, None], jnp.take(tri.points, tinv, axis=0), state.mp_pos
            ),
            mp_triangulated=state.mp_triangulated | thit,
        )

    v = lambda f: jax.jit(jax.vmap(f))

    f_ins = v(blk_insert)
    st1, kf_slot, inserted = jax.block_until_ready(f_ins(state, it))
    t_ins = timeit(f_ins, state, it)
    print(f"S={S} insert_keyframe: {t_ins*1e3:8.2f} ms", flush=True)

    f_obs = v(blk_obs)
    t_obs = timeit(f_obs, st1, it, kf_slot, inserted)
    print(f"S={S} observations:    {t_obs*1e3:8.2f} ms", flush=True)

    f_cre = v(blk_create)
    t_cre = timeit(f_cre, st1, it, kf_slot, inserted)
    print(f"S={S} create_mappoints:{t_cre*1e3:8.2f} ms", flush=True)

    f_tri = v(blk_tri)
    t_tri = timeit(f_tri, st1, it, inserted)
    print(f"S={S} triangulation:   {t_tri*1e3:8.2f} ms", flush=True)

    # sub-pieces of the suspects
    def sub_invlookup(it):
        return packing.inverse_lookup(C, it.midx, it.ref_inliers & it.mval)

    t = timeit(v(sub_invlookup), it)
    print(f"S={S}   inverse_lookup(C={C},k={it.midx.shape[-1]}): {t*1e3:8.2f} ms", flush=True)

    def sub_compact(state, it):
        inlier_mp, _ = packing.inverse_lookup(C, it.midx, it.ref_inliers & it.mval)
        tri_cand = (
            it.tmap & inlier_mp & ~state.mp_triangulated
            & ~state.mp_optimized & ~state.mp_outlier
        )
        return packing.compact_indices(tri_cand, cfg.triangulation_batch)

    t = timeit(v(sub_compact), st1, it)
    print(f"S={S}   invlookup+compact_indices(C->B): {t*1e3:8.2f} ms", flush=True)

    def sub_free(state):
        free_mask = ~state.mp_valid | state.mp_outlier
        return packing.compact_indices(free_mask, cfg.number_of_features)

    t = timeit(v(sub_free), st1)
    print(f"S={S}   compact_indices(free slots):     {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
