"""Round-5: where do the compute half's 92 GB/step (1.28 GB/frame) go?

`mfu_r5.md` item 1: the 72-stream tracking-compute program is bandwidth-bound
at 63% of HBM peak, so its step time is ~(bytes / 819 GB/s).  This script
attributes the bytes: it compiles CUMULATIVE prefixes of the exact
`track_compute` pipeline (vmapped, S=72, official bench mcfg) and prints
XLA cost-model totals per prefix; consecutive differences = per-stage cost.

Stages (mirroring frontend.track_compute):
  1. gray + ORB extract
  2. + depth lookup / back-projection + packed-NN table + tracking map
  3. + coarse match/RANSAC/LM round
  4. + fine round (== the full compute program)

Compile-only (no timing; the cost model is clock-independent).
Run on the chip: ``python benchmarks/profile_r5_compute_bytes.py``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import bench
from rgbd_visualodometry_tpu import camera as cam_mod
from rgbd_visualodometry_tpu import mapstate
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.ops import depth as depth_mod
from rgbd_visualodometry_tpu.ops import image as im
from rgbd_visualodometry_tpu.ops import matching, orb, se3
from rgbd_visualodometry_tpu.parallel import MultiStreamVO, make_mesh
from rgbd_visualodometry_tpu.pipeline import frontend as fe
from rgbd_visualodometry_tpu.utils import enable_compilation_cache

S = 72


def cost(tag, fn, *args):
    c = jax.jit(jax.vmap(fn)).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    ca = ca or {}
    fl, by = float(ca.get("flops", 0)), float(ca.get("bytes accessed", 0))
    print(f"{tag:34s} {fl/1e9:9.2f} GF  {by/1e9:8.3f} GB", flush=True)
    return fl, by


def main():
    enable_compilation_cache()
    cfg = bench.multistream_cfg(VOConfig(), full_vo=True)
    camera = cam_mod.Camera.from_config(cfg)
    vo = MultiStreamVO(cfg, n_streams=S, mesh=make_mesh(1))
    seqs = [bench._make_frames(cfg, 1, seed=s) for s in range(S)]
    fb = vo.put_batch(
        np.stack([sq[0].rgb for sq in seqs]),
        np.stack([sq[0].depth for sq in seqs]),
        np.asarray([sq[0].timestamp for sq in seqs]),
    )
    state = vo.states
    N = cfg.number_of_features

    def extract(frame):
        gray = im.rgb_to_gray(frame.rgb)
        return orb.extract(
            gray, nfeatures=N, nlevels=cfg.level_pyramid, scale=cfg.scale_factor,
            threshold=float(cfg.fast_threshold), border=cfg.edge_threshold,
            angle_bins=cfg.orb_angle_bins, use_bf16=cfg.orb_bf16,
            brief_chunk=cfg.orb_brief_chunk, patch_bf16=cfg.orb_patch_bf16,
        )

    def prefix2(state, frame):
        feats = extract(frame)
        dep = depth_mod.lookup_depth(frame.depth, feats.xy, camera.depth_scale)
        kp_cam = cam_mod.pixel2camera(camera, feats.xy, dep.depth)
        tmap = mapstate.tracking_map_mask(state, cfg)
        nn = matching.nearest_keypoints_packed(
            state.mp_desc, feats.desc_bipolar, feats.valid
        )
        return feats, dep, kp_cam, tmap, nn

    def prefix3(state, frame):
        feats, dep, kp_cam, tmap, nn = prefix2(state, frame)
        rng, k1, k2 = jax.random.split(state.rng, 3)
        is_lost = state.fsm == mapstate.LOST
        pose_c, info = fe._match_and_estimate(
            cfg, camera, state, nn, feats, kp_cam, dep, tmap,
            state.prev_pose, k1, is_lost, coarse=True,
        )
        return pose_c, info["rr"].num_inliers, feats, dep, tmap

    # stage 1: extraction alone (per-frame frame pytree -> vmap over S)
    f1 = cost("1 gray+ORB extract", lambda f: extract(f), fb)
    f2 = cost("2 +depth/NN/tmap", prefix2, state, fb)
    f3 = cost("3 +coarse round", prefix3, state, fb)
    f4 = cost("4 full track_compute",
              lambda s, f: fe.track_compute(cfg, camera, s, f), state, fb)

    print("\nper-stage deltas (GB):")
    print(f"  extract          : {f1[1]/1e9:8.3f}")
    print(f"  depth+NN+tmap    : {(f2[1]-f1[1])/1e9:8.3f}")
    print(f"  coarse round     : {(f3[1]-f2[1])/1e9:8.3f}")
    print(f"  fine round (+rest): {(f4[1]-f3[1])/1e9:8.3f}")


if __name__ == "__main__":
    main()
