"""Round-4: compile-only memory probe of the real multistream programs.

Timing is unreliable on the axon platform (see round4_tpu_runs.md), but
``compiled.memory_analysis()`` reports the buffer-assignment sizes XLA
actually allocated — hard evidence for or against the T(8,128) minor-dim
padding blowup on the pool arrays, independent of any clock.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import bench
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.parallel import MultiStreamVO, make_mesh
from rgbd_visualodometry_tpu.utils import enable_compilation_cache


def report(tag, lowered_fn, *args):
    compiled = lowered_fn.lower(*args).compile()
    ma = compiled.memory_analysis()
    gb = 1024 ** 3
    if ma is None or not hasattr(ma, "temp_size_in_bytes"):
        # non-TPU backends may return None / a partial object (ADVICE r4)
        print(f"{tag}: memory_analysis unavailable on this backend", flush=True)
        return compiled
    print(
        f"{tag}: args={ma.argument_size_in_bytes/gb:.3f} GiB  "
        f"out={ma.output_size_in_bytes/gb:.3f} GiB  "
        f"temp={ma.temp_size_in_bytes/gb:.3f} GiB  "
        f"alias={ma.alias_size_in_bytes/gb:.3f} GiB",
        flush=True,
    )
    return compiled


def main():
    enable_compilation_cache()
    S = 72
    cfg = bench.multistream_cfg(VOConfig(), full_vo=True)
    print(f"device={jax.devices()[0]}  S={S}  C={cfg.max_mappoints}  "
          f"M={cfg.max_obs_per_mappoint}  K={cfg.max_keyframes}", flush=True)
    vo = MultiStreamVO(cfg, n_streams=S, mesh=make_mesh(1))

    seqs = [bench._make_frames(cfg, 1, seed=s) for s in range(S)]
    rgb = np.stack([sq[0].rgb for sq in seqs])
    depth = np.stack([sq[0].depth for sq in seqs])
    ts = np.asarray([sq[0].timestamp for sq in seqs])
    fb = vo.put_batch(rgb, depth, ts)

    # logical pool footprint for contrast
    logical = sum(np.prod(x.shape) * x.dtype.itemsize for x in jax.tree.leaves(vo.states))
    print(f"logical state size: {logical/1024**3:.3f} GiB", flush=True)

    report("compute", vo._compute, vo.states, fb)
    it = vo._compute(vo.states, fb)
    report("update ", vo._update, vo.states, it)


if __name__ == "__main__":
    main()
