"""Round-4: which gather formulation is slow at [S=72, C=16384] <- [N=500]?

The bisect shows each vmapped ``jnp.take(rows, inv, axis=0)`` in the update
half costs 6-8 ms, while a take_along_axis microbench of the same shape ran
at 0.03 ms.  Time every candidate formulation with identical inputs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu.utils import enable_compilation_cache


def timeit(fn, *args, n=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def main():
    enable_compilation_cache()
    S, C, N = 72, 16384, 500
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    rows = jax.random.normal(k1, (S, N, 3), jnp.float32)
    inv = jax.random.randint(k2, (S, C), 0, N)
    hit = jax.random.bernoulli(k3, 0.03, (S, C))
    pool = jax.random.normal(k1, (S, C, 3), jnp.float32)

    @jax.jit
    def f_tala(rows, inv, hit, pool):
        g = jnp.take_along_axis(rows, inv[..., None], axis=1)
        return jnp.where(hit[..., None], g, pool)

    @jax.jit
    @jax.vmap
    def f_take(rows, inv, hit, pool):
        return jnp.where(hit[:, None], jnp.take(rows, inv, axis=0), pool)

    @jax.jit
    @jax.vmap
    def f_take_clip(rows, inv, hit, pool):
        return jnp.where(
            hit[:, None], jnp.take(rows, inv, axis=0, mode="clip"), pool
        )

    @jax.jit
    @jax.vmap
    def f_index(rows, inv, hit, pool):
        return jnp.where(hit[:, None], rows[inv], pool)

    for name, fn in [
        ("take_along_axis (batched)", f_tala),
        ("vmap jnp.take (production)", f_take),
        ("vmap jnp.take mode=clip", f_take_clip),
        ("vmap rows[inv]", f_index),
    ]:
        t = timeit(fn, rows, inv, hit, pool)
        print(f"{name:28s}: {t*1e3:8.3f} ms", flush=True)

    # u32 payload (mp_desc) variant
    rows8 = jax.random.randint(k1, (S, N, 8), 0, 1 << 30).astype(jnp.uint32)
    pool8 = jnp.zeros((S, C, 8), jnp.uint32)

    @jax.jit
    def f8_tala(rows, inv, hit, pool):
        g = jnp.take_along_axis(rows, inv[..., None], axis=1)
        return jnp.where(hit[..., None], g, pool)

    @jax.jit
    @jax.vmap
    def f8_take(rows, inv, hit, pool):
        return jnp.where(hit[:, None], jnp.take(rows, inv, axis=0), pool)

    t = timeit(f8_tala, rows8, inv, hit, pool8)
    print(f"u32[8] take_along_axis      : {t*1e3:8.3f} ms", flush=True)
    t = timeit(f8_take, rows8, inv, hit, pool8)
    print(f"u32[8] vmap jnp.take        : {t*1e3:8.3f} ms", flush=True)

    # 1-D payload (depth) variant
    rows1 = jax.random.normal(k1, (S, N), jnp.float32)
    pool1 = jnp.zeros((S, C), jnp.float32)

    @jax.jit
    def f1_tala(rows, inv, hit, pool):
        g = jnp.take_along_axis(rows, inv, axis=1)
        return jnp.where(hit, g, pool)

    @jax.jit
    @jax.vmap
    def f1_take(rows, inv, hit, pool):
        return jnp.where(hit, jnp.take(rows, inv), pool)

    t = timeit(f1_tala, rows1, inv, hit, pool1)
    print(f"f32[ ] take_along_axis      : {t*1e3:8.3f} ms", flush=True)
    t = timeit(f1_take, rows1, inv, hit, pool1)
    print(f"f32[ ] vmap jnp.take        : {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
