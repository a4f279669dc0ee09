"""Round-4: stage-level breakdown of the batched tracking compute half.

Times vmapped ORB extract / matching / RANSAC+LM separately at the bench
multistream config, plus knob variants (patch bf16, brief chunk).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from rgbd_visualodometry_tpu.camera import Camera
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.ops import image as im
from rgbd_visualodometry_tpu.ops import matching, orb
from rgbd_visualodometry_tpu.utils import enable_compilation_cache


def timeit(fn, n=10):
    fn()
    jax.effects_barrier()
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def main():
    enable_compilation_cache()
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mcfg = bench.multistream_cfg(VOConfig(), full_vo=True)
    cam = Camera.from_config(mcfg)
    seqs = [bench._make_frames(mcfg, 1, seed=s)[0] for s in range(S)]
    rgb = jnp.asarray(np.stack([f.rgb for f in seqs]))
    gray = jax.block_until_ready(jax.jit(jax.vmap(im.rgb_to_gray))(rgb))

    def extract_fn(cfg):
        def one(g):
            return orb.extract(
                g, nfeatures=cfg.number_of_features, nlevels=cfg.level_pyramid,
                scale=cfg.scale_factor, threshold=float(cfg.fast_threshold),
                border=cfg.edge_threshold, angle_bins=cfg.orb_angle_bins,
                use_bf16=cfg.orb_bf16, brief_chunk=cfg.orb_brief_chunk,
                patch_bf16=cfg.orb_patch_bf16,
            )
        return jax.jit(jax.vmap(one))

    base = extract_fn(mcfg)
    t = timeit(lambda: base(gray))
    print(f"S={S} orb.extract base: {t*1e3:8.2f} ms ({t/S*1e3:6.3f}/stream)", flush=True)

    for tag, c in [
        ("patch_bf16", mcfg.replace(orb_patch_bf16=True)),
        ("chunk12", mcfg.replace(orb_brief_chunk=12)),
        ("chunk24", mcfg.replace(orb_brief_chunk=24)),
        ("patch_bf16+chunk12", mcfg.replace(orb_patch_bf16=True, orb_brief_chunk=12)),
        ("bins90", mcfg.replace(orb_angle_bins=90)),
        ("bins90+patchbf16", mcfg.replace(orb_angle_bins=90, orb_patch_bf16=True)),
        ("lvl6", mcfg.replace(level_pyramid=6)),
    ]:
        fn = extract_fn(c)
        t = timeit(lambda: fn(gray))
        print(f"S={S} orb.extract {tag}: {t*1e3:8.2f} ms ({t/S*1e3:6.3f}/stream)", flush=True)

    feats = jax.block_until_ready(base(gray))

    # matching against a full random packed pool (worst case C=16384)
    C = mcfg.max_mappoints
    rng = np.random.default_rng(0)
    pool_desc = jnp.asarray(rng.integers(0, 1 << 32, (S, C, 8), dtype=np.uint64).astype(np.uint32))

    def match_packed():
        return jax.jit(jax.vmap(matching.nearest_keypoints_packed))(
            pool_desc, feats.desc_bipolar, feats.valid
        )

    t = timeit(match_packed)
    print(f"S={S} packed matching x1: {t*1e3:8.2f} ms ({t/S*1e3:6.3f}/stream)", flush=True)


if __name__ == "__main__":
    main()
