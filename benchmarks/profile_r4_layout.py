"""Round-4: TPU layout A/B - [C, 3] pools vs [3, C] pools at S=72.

Hypothesis: VOState's [C, 3] / [C, M, 2] pools put dims of size 2-3 on the
128-lane minor axis, so every elementwise pass moves ~40x more physical
bytes than logical (tiles padded 3 -> 128).  If true, transposing the pool
layout should speed elementwise update ops by ~an order of magnitude.
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
    S, C, M = 72, 16384, 8
    key = jax.random.PRNGKey(0)
    pos_cm = jax.random.normal(key, (S, C, 3), jnp.float32)  # [C, 3] layout
    pos_mc = jnp.swapaxes(pos_cm, 1, 2).copy()  # [3, C] layout
    norm_cm = jax.random.normal(key, (S, C, 3), jnp.float32)
    norm_mc = jnp.swapaxes(norm_cm, 1, 2).copy()
    center = jax.random.normal(key, (S, 3), jnp.float32)
    do = jax.random.bernoulli(key, 0.5, (S, C))
    uv_cm = jax.random.normal(key, (S, C, M, 2), jnp.float32)
    uv_mc = jnp.moveaxis(uv_cm, (2, 3), (1, 2)).reshape(S, M * 2, C).copy()
    onehot = jax.random.bernoulli(key, 0.1, (S, C, M))
    newuv = jax.random.normal(key, (S, C, 2), jnp.float32)
    newuv_t = jnp.swapaxes(newuv, 1, 2).copy()

    # --- norm update (add_observations inner), [C, 3] vs [3, C] ------------
    @jax.jit
    def norm_cm_fn(pos, nrm, center, do):
        d = pos - center[:, None, :]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        nn = nrm + d
        nn = nn / jnp.maximum(jnp.linalg.norm(nn, axis=-1, keepdims=True), 1e-12)
        return jnp.where(do[..., None], nn, nrm)

    @jax.jit
    def norm_mc_fn(pos, nrm, center, do):
        d = pos - center[:, :, None]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)
        nn = nrm + d
        nn = nn / jnp.maximum(jnp.linalg.norm(nn, axis=1, keepdims=True), 1e-12)
        return jnp.where(do[:, None, :], nn, nrm)

    t1 = timeit(norm_cm_fn, pos_cm, norm_cm, center, do)
    t2 = timeit(norm_mc_fn, pos_mc, norm_mc, center, do)
    print(f"norm update  [C,3]: {t1*1e3:7.2f} ms   [3,C]: {t2*1e3:7.2f} ms", flush=True)

    # --- obs_uv masked write, [C, M, 2] vs [M*2, C] -------------------------
    @jax.jit
    def uv_cm_fn(uv, onehot, new):
        return jnp.where(onehot[..., None], new[:, :, None, :], uv)

    @jax.jit
    def uv_mc_fn(uv, onehot, new_t):
        # uv [S, M*2, C]; onehot [S, C, M] -> [S, M, C] -> repeat to M*2
        oh = jnp.swapaxes(onehot, 1, 2)  # [S, M, C]
        oh2 = jnp.repeat(oh, 2, axis=1)  # [S, M*2, C] (u row then v row per M)
        new2 = jnp.tile(new_t, (1, M, 1))  # [S, M*2, C]
        return jnp.where(oh2, new2, uv)

    t1 = timeit(uv_cm_fn, uv_cm, onehot, newuv)
    t2 = timeit(uv_mc_fn, uv_mc, onehot, newuv_t)
    print(f"obs_uv write [C,M,2]: {t1*1e3:7.2f} ms   [M*2,C]: {t2*1e3:7.2f} ms", flush=True)

    # --- gather rows [N] -> [C] (create path) vs one-hot matmul ------------
    N = 512
    rows = jax.random.normal(key, (S, N, 3), jnp.float32)
    rows_t = jnp.swapaxes(rows, 1, 2).copy()  # [S, 3, N]
    inv = jax.random.randint(key, (S, C), 0, N)
    tgt = jax.random.randint(key, (S, N), 0, C)  # packed slot targets

    @jax.jit
    def gather_fn(rows, inv):
        return jnp.take_along_axis(rows, inv[..., None], axis=1)

    @jax.jit
    def onehot_matmul_fn(rows_t, tgt):
        eq = (tgt[:, None, :] == jnp.arange(C)[None, :, None]).astype(jnp.float32)
        # [S, C, N] @ [S, N, 3] -> but keep [3, C] orientation: rows_t @ eq^T
        return jnp.einsum("spn,scn->spc", rows_t, eq)

    t1 = timeit(gather_fn, rows, inv)
    t2 = timeit(onehot_matmul_fn, rows_t, tgt)
    print(f"rows->pool   gather[C,3]: {t1*1e3:7.2f} ms   onehot-matmul[3,C]: {t2*1e3:7.2f} ms", flush=True)

    # --- same but payload wide enough to be honest (pos+uv+depth = 6 cols) --
    rows6_t = jax.random.normal(key, (S, 6, N), jnp.float32)

    @jax.jit
    def onehot_matmul6(rows_t, tgt):
        eq = (tgt[:, None, :] == jnp.arange(C)[None, :, None]).astype(jnp.float32)
        return jnp.einsum("spn,scn->spc", rows_t, eq)

    t2 = timeit(onehot_matmul6, rows6_t, tgt)
    print(f"one-hot matmul, 6-col payload -> [6, C]: {t2*1e3:7.2f} ms", flush=True)

    # --- cumsum over C: int32 [C] 1-D ----------------------------------------
    mask = jax.random.bernoulli(key, 0.5, (S, C))

    @jax.jit
    def cumsum_fn(m):
        return jnp.cumsum(m.astype(jnp.int32), axis=-1)

    t1 = timeit(cumsum_fn, mask)
    print(f"cumsum over C (S batched):  {t1*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
