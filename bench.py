"""Benchmark driver: full-resolution VO tracking throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Protocol (north star in BASELINE.md): TUM fr1/xyz-class workload -
640x480 RGB-D @ fr1 intrinsics, 500 ORB features over 8 pyramid levels,
full tracking pipeline (extract -> coarse/fine match+RANSAC+LM -> keyframe /
map management) with local BA dispatched per keyframe, exactly what
``run_vo`` times per frame at ``app/run_vo.cpp:104-109``.

The TUM dataset cannot be downloaded in this environment (no egress), so
frames come from the synthetic renderer at identical resolution/intrinsics
and comparable feature density, moving at fr1/xyz-like speed.  The
``vs_baseline`` divisor is the reference C++ pipeline's measured ballpark of
~30 FPS (no number is published - README has plots only; 30 FPS = the
~33 ms/frame a -O3 build of ORB extract + FLANN + PnP + 2x10 LM iterations
costs on a modern x86 core; see BASELINE.md).
"""

import json
import sys
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 30.0
WARMUP_FRAMES = 12
MEASURE_FRAMES = 60


def main():
    import jax

    from rgbd_visualodometry_tpu.config import VOConfig
    from rgbd_visualodometry_tpu.io import synthetic
    from rgbd_visualodometry_tpu.pipeline.system import VisualOdometry

    cfg = VOConfig()  # full fr1 defaults: 640x480, 500 features, 8 levels

    scene = synthetic.SyntheticScene(
        width=cfg.image_width, height=cfg.image_height,
        fx=cfg.camera_fx, fy=cfg.camera_fy, cx=cfg.camera_cx, cy=cfg.camera_cy,
    )
    seq = synthetic.generate_sequence(
        WARMUP_FRAMES + MEASURE_FRAMES, scene=scene,
        step_t=(0.012, 0.002, 0.0), step_r=(0.0, 0.0, 0.003),
    )
    frames = [(f.rgb, f.depth, f.timestamp) for f in seq]

    vo = VisualOdometry(cfg)
    for rgb, depth, ts in frames[:WARMUP_FRAMES]:
        vo.process(rgb, depth, ts)
    jax.block_until_ready(vo.state)

    t0 = time.perf_counter()
    for rgb, depth, ts in frames[WARMUP_FRAMES:]:
        vo.process(rgb, depth, ts)
    jax.block_until_ready(vo.state)
    wall = time.perf_counter() - t0

    tracked = sum(r.tracked for r in vo.results)
    assert tracked == len(frames), f"tracking failed: {tracked}/{len(frames)}"

    fps = MEASURE_FRAMES / wall
    print(
        json.dumps(
            {
                "metric": "synthetic fr1-class 640x480 full-VO tracking FPS (single chip)",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
