"""Round-5: where do the ~670 ms of a 72-stream BA dispatch go?

`mfu_r5.md` shows the vmapped BA dispatch at 13% of HBM peak / 0.0% MXU -
latency-bound, 7.6x above its own bytes floor.  This script times the EXACT
bench BA program (`MultiStreamVO._ba`, S=72, official mcfg) as a function of
`ba_iterations` (both LM rounds use it), separating:

- the fixed cost (problem build from the C-minor pools, chi2/prune rounds,
  write-back scatters, and the full-state masked select of `masked_ba`)
- the per-LM-iteration cost (the sequential while_loop body: block build,
  48x48 Cholesky + 2 triangular solves, cost eval)

Timing uses the data-anchored steady-state pattern (enqueue N dispatches,
materialize one element of the final state; in-order queue => all executed).
Run on the chip: ``python benchmarks/profile_r5_ba.py``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.parallel import MultiStreamVO, make_mesh
from rgbd_visualodometry_tpu.utils import enable_compilation_cache

S = 72
N_DISPATCH = 6
WINDOWS = 3


def main():
    enable_compilation_cache()
    results = {}
    for iters in [0, 2, 5, 10]:
        mcfg = bench.multistream_cfg(VOConfig(), full_vo=True).replace(
            ba_iterations=iters
        )
        vo = MultiStreamVO(mcfg, n_streams=S, mesh=make_mesh(1))
        # warm the map with a few real frames so the problem build sees a
        # realistic occupancy (empty-map BA masks the same ops but a real
        # map exercises the gathers on live data)
        seqs = [bench._make_frames(mcfg, 4, seed=s) for s in range(S)]
        for i in range(4):
            fb = vo.put_batch(
                np.stack([sq[i].rgb for sq in seqs]),
                np.stack([sq[i].depth for sq in seqs]),
                np.asarray([sq[i].timestamp for sq in seqs]),
            )
            out = vo.step(fb)
        vo.finish()
        np.asarray(out.packed)  # drain tracking + warmup BA

        kf = jnp.asarray(np.asarray(out.kf_slot), jnp.int32)
        pred = jnp.ones((S,), bool)
        # compile
        vo.states = vo._ba(vo.states, kf, pred)
        np.asarray(jax.tree.leaves(vo.states)[0].reshape(-1)[:1])

        per = []
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(N_DISPATCH):
                vo.states = vo._ba(vo.states, kf, pred)
            np.asarray(jax.tree.leaves(vo.states)[0].reshape(-1)[:1])
            per.append((time.perf_counter() - t0) / N_DISPATCH * 1e3)
        med = sorted(per)[len(per) // 2]
        results[iters] = med
        print(f"ba_iterations={iters:3d}: {[f'{p:.1f}' for p in per]} ms  "
              f"median {med:.1f} ms/dispatch", flush=True)

    if 0 in results and 10 in results:
        fixed = results[0]
        # both LM rounds run `iters` iterations -> slope per single iteration
        slope = (results[10] - results[0]) / 20.0
        print(f"\nfixed (build+prune+writeback+select): {fixed:.1f} ms")
        print(f"per-LM-iteration cost (x2 rounds):     {slope:.2f} ms")


if __name__ == "__main__":
    main()
