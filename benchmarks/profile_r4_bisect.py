"""Round-4: bisect the create_mappoints 'writes' cost at S=72.

profile_r4_create: the writes block = 49 ms while every individual
where/gather microbenches at ~0.03 ms.  Identify the real hog by (a) an
identity function with identical input/output marshaling, (b) variants that
materialize one output leaf at a time (DCE prunes the rest).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from rgbd_visualodometry_tpu import camera as cam_mod
from rgbd_visualodometry_tpu.camera import Camera
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.ops import packing
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
    N = cfg.number_of_features

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
    v = lambda f: jax.jit(jax.vmap(f))

    def prep(state, it):
        inlier_packed = it.ref_inliers & it.mval
        matched_kp = packing.scatter_back(
            N, jnp.where(inlier_packed, it.kpi, N), inlier_packed
        )
        create_mask = it.kp_valid & it.depth_valid & ~(matched_kp & ~it.is_init)
        free_mask = ~state.mp_valid | state.mp_outlier
        rank = jnp.cumsum(create_mask.astype(jnp.int32)) - 1
        free_idx, free_ok = packing.compact_indices(free_mask, N)
        slot = jnp.take(free_idx, jnp.clip(rank, 0, N - 1))
        ok = create_mask & jnp.take(free_ok, jnp.clip(rank, 0, N - 1))
        hit, inv = packing.inverse_lookup(C, slot, ok)
        return hit, inv

    hit, inv = jax.block_until_ready(v(prep)(state, it))
    kf_slot = jnp.asarray(np.full((S,), 3, np.int32))

    # identity: same marshaling as a full-state-returning block, no compute
    def blk_identity(state, it, hit, inv, kf_slot):
        return state

    t = timeit(v(blk_identity), state, it, hit, inv, kf_slot)
    print(f"S={S} identity (marshal+copy only): {t*1e3:8.2f} ms", flush=True)

    def make_blk(which):
        def blk(state, it, hit, inv, kf_slot):
            positions = cam_mod.pixel2world(camera, it.xy, it.pose_used, it.depth)
            cam_center = cam_mod.camera_center(it.pose_used)
            d = positions - cam_center[None, :]
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
            M = state.obs_kf.shape[1]
            first_col = jnp.arange(M) == 0
            K = state.A_inc.shape[0]
            rowsel = jnp.arange(K) == jnp.clip(kf_slot, 0, K - 1)

            def put(pool, rows):
                cond = hit.reshape((C,) + (1,) * (pool.ndim - 1))
                return jnp.where(cond, jnp.take(rows, inv, axis=0), pool)

            upd = {}
            if which in ("pos", "all"):
                upd["mp_pos"] = put(state.mp_pos, positions)
            if which in ("desc", "all"):
                upd["mp_desc"] = put(state.mp_desc, it.desc)
            if which in ("norm", "all"):
                upd["mp_norm"] = put(state.mp_norm, d)
            if which in ("flags", "all"):
                upd["mp_valid"] = state.mp_valid | hit
                upd["mp_outlier"] = state.mp_outlier & ~hit
                upd["mp_triangulated"] = state.mp_triangulated & ~hit
                upd["mp_optimized"] = state.mp_optimized & ~hit
            if which in ("obs", "all"):
                upd["obs_kf"] = jnp.where(
                    hit[:, None], jnp.where(first_col, kf_slot, -1)[None, :],
                    state.obs_kf,
                )
                upd["obs_uv"] = jnp.where(
                    hit[:, None, None],
                    first_col[None, :, None]
                    * jnp.take(it.xy, inv, axis=0)[:, None, :],
                    state.obs_uv,
                )
                upd["obs_depth"] = jnp.where(
                    hit[:, None],
                    first_col[None, :] * jnp.take(it.depth, inv)[:, None],
                    state.obs_depth,
                )
                upd["obs_valid"] = jnp.where(
                    hit[:, None], first_col[None, :], state.obs_valid
                )
            if which in ("ainc", "all"):
                upd["A_inc"] = jnp.where(
                    rowsel[:, None],
                    jnp.maximum(state.A_inc, hit.astype(jnp.int8)[None, :]),
                    state.A_inc,
                )
            return state._replace(**upd)

        return blk

    for which in ("all", "pos", "desc", "norm", "flags", "obs", "ainc"):
        t = timeit(v(make_blk(which)), state, it, hit, inv, kf_slot)
        print(f"S={S} writes[{which:5s}]: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
