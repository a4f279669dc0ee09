"""Round-4: sub-op breakdown of create_mappoints / add_observations at S=72.

profile_r4_update found create_mappoints at 55.8 ms and add_observations at
27.7 ms of the 98.7 ms update half.  This isolates the pieces: the free-slot
compaction, the inverse lookup, the pool writes, and the A_inc row update.
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

    # realistic inputs for the create path
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
        return create_mask, slot, ok, hit, inv

    pre = jax.block_until_ready(v(prep)(state, it))
    create_mask, slot, ok, hit, inv = pre
    t = timeit(v(prep), state, it)
    print(f"S={S} create: mask+compact+invlookup: {t*1e3:8.2f} ms", flush=True)

    def sub_cumsum_search(state, create_mask):
        free_mask = ~state.mp_valid | state.mp_outlier
        return packing.compact_indices(free_mask, N)

    t = timeit(v(sub_cumsum_search), state, create_mask)
    print(f"S={S}   compact_indices(free, N={N}):  {t*1e3:8.2f} ms", flush=True)

    def sub_cumsum_only(state):
        free_mask = ~state.mp_valid | state.mp_outlier
        return jnp.cumsum(free_mask.astype(jnp.int32))

    t = timeit(v(sub_cumsum_only), state)
    print(f"S={S}   cumsum over C only:            {t*1e3:8.2f} ms", flush=True)

    def sub_search_only(csum):
        return jnp.searchsorted(
            csum, jnp.arange(1, N + 1, dtype=jnp.int32), side="left"
        )

    csum = jax.block_until_ready(v(sub_cumsum_only)(state))
    t = timeit(v(sub_search_only), csum)
    print(f"S={S}   searchsorted only:             {t*1e3:8.2f} ms", flush=True)

    # pool/observation writes with precomputed hit/inv
    def sub_writes(state, it, hit, inv, kf_slot):
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

        return state._replace(
            mp_pos=put(state.mp_pos, positions),
            mp_desc=put(state.mp_desc, it.desc),
            mp_bip=put(state.mp_bip, it.bip[:, : state.mp_bip.shape[1]]),
            mp_norm=put(state.mp_norm, d),
            mp_valid=state.mp_valid | hit,
            mp_outlier=state.mp_outlier & ~hit,
            mp_triangulated=state.mp_triangulated & ~hit,
            mp_optimized=state.mp_optimized & ~hit,
            obs_kf=jnp.where(
                hit[:, None], jnp.where(first_col, kf_slot, -1)[None, :],
                state.obs_kf,
            ),
            obs_uv=jnp.where(
                hit[:, None, None],
                first_col[None, :, None] * jnp.take(it.xy, inv, axis=0)[:, None, :],
                state.obs_uv,
            ),
            obs_depth=jnp.where(
                hit[:, None],
                first_col[None, :] * jnp.take(it.depth, inv)[:, None],
                state.obs_depth,
            ),
            obs_valid=jnp.where(hit[:, None], first_col[None, :], state.obs_valid),
            A_inc=jnp.where(
                rowsel[:, None],
                jnp.maximum(state.A_inc, hit.astype(jnp.int8)[None, :]),
                state.A_inc,
            ),
        )

    kf_slot = jnp.asarray(np.full((S,), 3, np.int32))
    t = timeit(v(sub_writes), state, it, hit, inv, kf_slot)
    print(f"S={S} create: writes only:            {t*1e3:8.2f} ms", flush=True)

    def sub_ainc(state, hit, kf_slot):
        K = state.A_inc.shape[0]
        rowsel = jnp.arange(K) == jnp.clip(kf_slot, 0, K - 1)
        return jnp.where(
            rowsel[:, None],
            jnp.maximum(state.A_inc, hit.astype(jnp.int8)[None, :]),
            state.A_inc,
        )

    t = timeit(v(sub_ainc), state, hit, kf_slot)
    print(f"S={S}   A_inc row update only:         {t*1e3:8.2f} ms", flush=True)

    # observation-side: first-free-slot computation vs the writes
    def sub_obs_firstfree(state):
        free = ~state.obs_valid
        has_free = jnp.any(free, axis=1)
        first_free = jnp.argmax(free, axis=1)
        return has_free, first_free

    t = timeit(v(sub_obs_firstfree), state)
    print(f"S={S} obs: first-free scan:           {t*1e3:8.2f} ms", flush=True)

    def sub_norm(state, it):
        cam_center = cam_mod.camera_center(it.pose_used)
        d = state.mp_pos - cam_center[None, :]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        new_norm = state.mp_norm + d
        return new_norm / jnp.maximum(
            jnp.linalg.norm(new_norm, axis=-1, keepdims=True), 1e-12
        )

    t = timeit(v(sub_norm), state, it)
    print(f"S={S} obs: norm update over C:        {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
