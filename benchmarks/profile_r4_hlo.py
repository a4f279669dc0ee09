"""Round-4: dump optimized HLO for the slow writes[pos] block vs the fast
microbench gather, to find what XLA does differently."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from rgbd_visualodometry_tpu import camera as cam_mod
from rgbd_visualodometry_tpu.camera import Camera
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.parallel import MultiStreamVO, make_mesh
from rgbd_visualodometry_tpu.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    S = 72
    cfg = bench.multistream_cfg(VOConfig(), full_vo=True)
    camera = Camera.from_config(cfg)
    C = cfg.max_mappoints

    seqs = [bench._make_frames(cfg, 1, seed=s) for s in range(S)]
    vo = MultiStreamVO(cfg, n_streams=S, mesh=make_mesh(1))
    rgb = np.stack([sq[0].rgb for sq in seqs])
    depth = np.stack([sq[0].depth for sq in seqs])
    ts = np.asarray([sq[0].timestamp for sq in seqs])
    fb = vo.put_batch(rgb, depth, ts)
    it = jax.block_until_ready(vo._compute(vo.states, fb))
    state = vo.states
    hit = jnp.zeros((S, C), bool)
    inv = jnp.zeros((S, C), jnp.int32)
    kf_slot = jnp.zeros((S,), jnp.int32)

    def blk_pos(state, it, hit, inv, kf_slot):
        positions = cam_mod.pixel2world(camera, it.xy, it.pose_used, it.depth)

        def put(pool, rows):
            cond = hit.reshape((C,) + (1,) * (pool.ndim - 1))
            return jnp.where(cond, jnp.take(rows, inv, axis=0), pool)

        return state._replace(mp_pos=put(state.mp_pos, positions))

    f = jax.jit(jax.vmap(blk_pos))
    txt = f.lower(state, it, hit, inv, kf_slot).compile().as_text()
    with open("/tmp/hlo_writes_pos.txt", "w") as fh:
        fh.write(txt)
    print("writes[pos] HLO:", len(txt), "bytes")
    for line in txt.splitlines():
        ls = line.strip()
        if ls.startswith(("ENTRY", "while", "%while", "fusion", "%fusion")) or (
            "gather(" in ls or "while(" in ls or "dynamic-slice(" in ls or "sort(" in ls
        ):
            print("  ", ls[:220])


if __name__ == "__main__":
    main()
