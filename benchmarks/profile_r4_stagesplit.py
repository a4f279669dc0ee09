"""Round-4: stage split of the 72-stream full-VO step by the ONLY valid
timing method on axon — long steady-state windows under queue back-pressure
(round4_tpu_runs.md calibration: block_until_ready returns at enqueue, so
short-n microbenchmarks are invalid; steady-state enqueue rate == execution
rate once the queue is deep).

Variants, all at the exact bench.multistream_cfg(full_vo=True), S=72:
  compute-only      : dispatch _compute per staged batch
  compute+update    : the tracking step without BA drain
  full step (+BA)   : vo.step() + finish(), the benched workload

_update and _ba donate their state argument, so the steady-state snapshot is
deep-copied before every reuse.
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
WARM = 4
MEAS = 12
WINDOWS = 3


def snap(states):
    return jax.tree.map(jnp.copy, states)


def main():
    enable_compilation_cache()
    mcfg = bench.multistream_cfg(VOConfig(), full_vo=True)
    seqs = [bench._make_frames(mcfg, WARM + MEAS, seed=s) for s in range(S)]

    def batch(i):
        rgb = np.stack([s[i].rgb for s in seqs])
        depth = np.stack([s[i].depth for s in seqs])
        ts = np.asarray([s[i].timestamp for s in seqs])
        return rgb, depth, ts

    vo = MultiStreamVO(mcfg, n_streams=S, mesh=make_mesh(1))
    batches = [vo.put_batch(*batch(i)) for i in range(WARM + MEAS)]
    jax.block_until_ready(batches)

    # warm up the map so steady-state pools are populated, and compile all
    for fb in batches[:WARM]:
        vo.step(fb)
    vo.finish()
    jax.block_until_ready(vo.states)
    frozen = jax.block_until_ready(snap(vo.states))  # steady-state snapshot

    results = {}

    def sync(tree):
        """Real device sync: block_until_ready returns at enqueue on axon
        (round4_tpu_runs.md), so close every window by MATERIALIZING one
        element of a result - the in-order queue proves all prior work ran
        (ADVICE r4)."""
        np.asarray(jax.tree.leaves(tree)[0].reshape(-1)[:1])
        return tree

    # --- full step (+BA), the benched workload ---------------------------
    # restart from the frozen snapshot each window so all three variants
    # time the SAME map occupancy (ADVICE r4: the old version let the map
    # evolve across full-step windows while the split variants reset)
    per = []
    for w in range(WINDOWS):
        vo.states = sync(snap(frozen))
        t0 = time.perf_counter()
        for fb in batches[WARM:]:
            out = vo.step(fb)
        vo.finish()
        sync(out.packed)
        per.append((time.perf_counter() - t0) / MEAS * 1e3)
    results["full step (+BA)"] = per

    # --- compute+update, no BA -------------------------------------------
    per = []
    for w in range(WINDOWS):
        st = sync(snap(frozen))  # _update donates its input
        t0 = time.perf_counter()
        for fb in batches[WARM:]:
            it = vo._compute(st, fb)
            st, out = vo._update(st, it)
        sync(out.packed)
        per.append((time.perf_counter() - t0) / MEAS * 1e3)
    results["compute+update"] = per

    # --- compute only ------------------------------------------------------
    per = []
    for w in range(WINDOWS):
        st = sync(snap(frozen))
        t0 = time.perf_counter()
        outs = [vo._compute(st, fb) for fb in batches[WARM:]]
        sync(outs[-1].pose_used)
        per.append((time.perf_counter() - t0) / MEAS * 1e3)
    results["compute only"] = per

    for tag, per in results.items():
        med = sorted(per)[len(per) // 2]
        fps = S * 1e3 / med
        print(f"{tag:18s}: {[f'{p:.1f}' for p in per]} ms/step  "
              f"median {med:.1f} ms -> {fps:.1f} FPS/chip", flush=True)


if __name__ == "__main__":
    main()
