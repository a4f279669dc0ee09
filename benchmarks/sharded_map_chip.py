"""ShardedMapVO at PRODUCTION shape on the REAL chip (VERDICT r3 task 5).

The 8-device virtual CPU mesh (dryrun_multichip, tests/test_parallel.py)
proves the SPMD partitioning is *correct* at fr1 capacities; this script
records the missing hardware evidence: the sharded program compiles and runs
on the physical TPU at mesh=1, and its steady-state per-frame cost is
measured against the plain ``VisualOdometry`` running the identical config.
The delta is the pure partitioner/annotation overhead a user pays to opt
into the sharded mode (with one chip there are no collectives to win it
back; on a real pod the same program spreads the [C, 256] pool and its
matmuls over ICI as validated on the virtual mesh).

Usage:   python benchmarks/sharded_map_chip.py [--frames 48]
Writes benchmarks/sharded_map_chip.json via --out.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import jax
import numpy as np


def measure(vo_factory, seq, warmup: int, label: str) -> dict:
    vo = vo_factory()
    t0 = time.perf_counter()
    r = vo.process(seq[0].rgb, seq[0].depth, seq[0].timestamp)
    jax.block_until_ready(vo.state)
    first = time.perf_counter() - t0

    for f in seq[1:warmup]:
        r = vo.process(f.rgb, f.depth, f.timestamp)
    jax.block_until_ready(vo.state)

    t0 = time.perf_counter()
    tracked = 0
    for f in seq[warmup:]:
        r = vo.process(f.rgb, f.depth, f.timestamp)
        tracked += bool(r.tracked)
    jax.block_until_ready(vo.state)
    dt = time.perf_counter() - t0
    n = len(seq) - warmup
    assert tracked == n, f"{label}: tracked {tracked}/{n}"
    return {
        "first_frame_s": round(first, 2),
        "steady_ms_per_frame": round(1e3 * dt / n, 2),
        "steady_fps": round(n / dt, 2),
        "frames": n,
        "num_mappoints": int(r.stats["num_mappoints"]),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from rgbd_visualodometry_tpu.config import VOConfig
    from rgbd_visualodometry_tpu.io import synthetic
    from rgbd_visualodometry_tpu.parallel import ShardedMapVO, make_mesh
    from rgbd_visualodometry_tpu.pipeline.system import VisualOdometry
    from rgbd_visualodometry_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    report = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "commit": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=__file__.rsplit("/", 2)[0],
        ).stdout.strip(),
    }
    if report["backend"] != "tpu":
        print(json.dumps({**report, "skipped": "no TPU attached"}))
        sys.exit(0)

    cfg = VOConfig()  # full fr1 production defaults: 640x480, C=65536
    scene = synthetic.SyntheticScene(
        width=cfg.image_width, height=cfg.image_height,
        fx=cfg.camera_fx, fy=cfg.camera_fy, cx=cfg.camera_cx, cy=cfg.camera_cy,
    )
    seq = synthetic.generate_sequence(
        args.frames, scene=scene, step_t=(0.012, 0.002, 0.0),
        step_r=(0.0, 0.0, 0.003),
    )

    report["plain"] = measure(
        lambda: VisualOdometry(cfg), seq, args.warmup, "plain"
    )
    report["sharded_mesh1"] = measure(
        lambda: ShardedMapVO(cfg, make_mesh(1, axis="map")),
        seq, args.warmup, "sharded",
    )
    report["overhead_pct"] = round(
        100.0
        * (
            report["sharded_mesh1"]["steady_ms_per_frame"]
            / report["plain"]["steady_ms_per_frame"]
            - 1.0
        ),
        1,
    )
    report["ok"] = True
    out = json.dumps(report, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
