"""Round-4: calibrate the timeit harness on the axon TPU.

Every layout/gather microbench reads ~0.03 ms even for ops that must move
150+ MB (>10 TB/s implied).  Time ops with KNOWN cost to find out whether
(a) block_until_ready really blocks, (b) repeated identical executions get
deduped, (c) the numbers are real.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rgbd_visualodometry_tpu.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)

    # --- known-FLOPs matmul: 8192^3*2 = 1.1 TFLOP; v5e bf16 peak ~197 TF/s
    a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
    b = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    jax.block_until_ready(mm(a, b))
    for n in (1, 4, 16):
        t0 = time.perf_counter()
        outs = [mm(a, b) for _ in range(n)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n
        print(f"matmul 8192^2 bf16  n={n:2d}: {dt*1e3:8.3f} ms  "
              f"(peak ~5.6 ms at 197 TF/s)", flush=True)

    # --- known-bytes elementwise: [72,16384,8,2] f32 where = 450 MB r+w min
    uv = jax.random.normal(key, (72, 16384, 8, 2), jnp.float32)
    onehot = jax.random.bernoulli(key, 0.1, (72, 16384, 8))
    new = jax.random.normal(key, (72, 16384, 2), jnp.float32)
    wf = jax.jit(lambda uv, onehot, new: jnp.where(onehot[..., None], new[:, :, None, :], uv))
    jax.block_until_ready(wf(uv, onehot, new))
    for n in (1, 4, 16):
        t0 = time.perf_counter()
        outs = [wf(uv, onehot, new) for _ in range(n)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n
        print(f"where [72,16384,8,2] n={n:2d}: {dt*1e3:8.3f} ms  "
              f"(>=0.55 ms at 820 GB/s logical)", flush=True)

    # --- force materialization: sum the where output (tiny extra cost)
    wsum = jax.jit(lambda uv, onehot, new: jnp.sum(
        jnp.where(onehot[..., None], new[:, :, None, :], uv)))
    jax.block_until_ready(wsum(uv, onehot, new))
    for n in (1, 16):
        t0 = time.perf_counter()
        outs = [wsum(uv, onehot, new) for _ in range(n)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n
        print(f"where+sum            n={n:2d}: {dt*1e3:8.3f} ms", flush=True)

    # --- distinct inputs per iteration (defeat any dedup)
    uvs = [jax.random.normal(jax.random.PRNGKey(i), (72, 16384, 8, 2), jnp.float32)
           for i in range(8)]
    jax.block_until_ready(uvs)
    t0 = time.perf_counter()
    outs = [wf(u, onehot, new) for u in uvs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 8
    print(f"where distinct-inputs n= 8: {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
