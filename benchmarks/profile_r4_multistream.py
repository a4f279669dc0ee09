"""Round-4: where does the batched multistream step time go?

Single-stream full VO runs at ~148 FPS (6.7 ms/step) but 72 streams reach
only ~202 aggregate FPS (356 ms/step = 53x the 1-stream cost for 72x the
work).  This times the two step halves (track_compute / apply_updates) and
the vmapped BA separately across stream counts to find the scaling hog.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import bench
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.parallel import MultiStreamVO, make_mesh
from rgbd_visualodometry_tpu.utils import enable_compilation_cache


def timeit(fn, n=8):
    fn()
    jax.effects_barrier()
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def profile(S):
    cfg = VOConfig()
    mcfg = bench.multistream_cfg(cfg, full_vo=True).replace(
        ba_min_frame_gap=0
    )
    seqs = [
        bench._make_frames(mcfg, 14, seed=s) for s in range(S)
    ]
    vo = MultiStreamVO(mcfg, n_streams=S, mesh=make_mesh(1))
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

    fb = batches[12]
    t_compute = timeit(lambda: vo._compute(vo.states, fb))
    inter = jax.block_until_ready(vo._compute(vo.states, fb))

    # full step (compute + update), measured via the undonated compute and
    # a fresh update each call is impossible (donation) - so time the
    # complete step loop over the last two batches and subtract
    def full_step():
        out = vo._compute(vo.states, fb)
        vo.states, o = vo._update(vo.states, out)
        return o.packed

    t_step = timeit(full_step)

    # vmapped BA (every stream predicated on)
    kf = np.full((S,), max(0, int(np.asarray(vo.states.num_kf)[0]) - 1), np.int32)
    pred = np.ones((S,), bool)

    def ba():
        vo.states = vo._ba(vo.states, jax.numpy.asarray(kf), jax.numpy.asarray(pred))
        return vo.states.num_kf

    t_ba = timeit(ba, n=4)

    print(
        f"S={S:3d}: compute {t_compute*1e3:8.2f} ms  step {t_step*1e3:8.2f} ms "
        f"(update {1e3*(t_step-t_compute):7.2f})  ba {t_ba*1e3:8.2f} ms  "
        f"| per-stream step {t_step/S*1e3:6.2f} ms",
        flush=True,
    )


def main():
    enable_compilation_cache()
    for S in [int(x) for x in (sys.argv[1:] or ["1", "8", "32", "72"])]:
        profile(S)


if __name__ == "__main__":
    main()
