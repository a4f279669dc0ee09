"""Round-4: find a sync primitive that really blocks on axon.

block_until_ready returns at ~20x above hardware peak -> it does not wait.
Try: (a) fetching a dependent scalar to host, (b) np.asarray of the output,
(c) chained dependency + final fetch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
    b = jax.random.normal(key, (8192, 8192), jnp.bfloat16)

    mm_s = jax.jit(lambda a, b: jnp.sum((a @ b).astype(jnp.float32)))
    float(mm_s(a, b))  # warm

    # (a) fetch dependent scalar each iteration
    for n in (1, 4):
        t0 = time.perf_counter()
        for _ in range(n):
            float(mm_s(a, b))
        dt = (time.perf_counter() - t0) / n
        print(f"matmul+sum fetch-each   n={n}: {dt*1e3:8.3f} ms (peak ~5.6)", flush=True)

    # (b) enqueue n, fetch only the last
    for n in (4, 16):
        t0 = time.perf_counter()
        outs = [mm_s(a, b) for _ in range(n)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / n
        print(f"matmul+sum fetch-last   n={n}: {dt*1e3:8.3f} ms (peak ~5.6)", flush=True)

    # (c) chained: out feeds next input (forces serial execution), fetch end
    mm_c = jax.jit(lambda a, b: (a @ b) * 1e-4)
    x = jax.block_until_ready(mm_c(a, b))
    for n in (4, 16):
        x = a
        t0 = time.perf_counter()
        for _ in range(n):
            x = mm_c(x, b)
        float(jnp.sum(x.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / n
        print(f"matmul chained+fetch    n={n}: {dt*1e3:8.3f} ms (peak ~5.6)", flush=True)

    # elementwise known-bytes with fetch-last
    uv = jax.random.normal(key, (72, 16384, 8, 2), jnp.float32)
    onehot = jax.random.bernoulli(key, 0.1, (72, 16384, 8))
    new = jax.random.normal(key, (72, 16384, 2), jnp.float32)
    wsum = jax.jit(lambda uv, onehot, new: jnp.sum(
        jnp.where(onehot[..., None], new[:, :, None, :], uv)))
    float(wsum(uv, onehot, new))
    for n in (4, 16):
        t0 = time.perf_counter()
        outs = [wsum(uv, onehot, new) for _ in range(n)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / n
        print(f"where+sum fetch-last    n={n}: {dt*1e3:8.3f} ms (>=0.55 logical, ~11.7 padded)", flush=True)


if __name__ == "__main__":
    main()
