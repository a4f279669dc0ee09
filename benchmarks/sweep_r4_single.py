"""Round-4 single-stream config sweep on the real chip.

Measures bench_single FPS for candidate production single-stream configs.
Accuracy at the winning config is pinned separately by
tests/test_contract_parity.py before it may become the bench config.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.utils import enable_compilation_cache

import bench


def main():
    enable_compilation_cache()
    base = VOConfig()
    cases = {
        "base": base,
        "map16k": base.replace(
            max_mappoints=16384, max_keyframes=128, max_obs_per_mappoint=8
        ),
        "map16k+ba1k": base.replace(
            max_mappoints=16384, max_keyframes=128, max_obs_per_mappoint=8,
            ba_max_points=1024, ba_max_poses=8,
        ),
        "mcfg1": bench.multistream_cfg(base, full_vo=True).replace(
            ba_min_frame_gap=0, packed_matching=False,
        ),
        "mcfg1+gap": bench.multistream_cfg(base, full_vo=True).replace(
            packed_matching=False,
        ),
        "mcfg1+patchbf16": bench.multistream_cfg(base, full_vo=True).replace(
            ba_min_frame_gap=0, packed_matching=False, orb_patch_bf16=True,
        ),
    }
    names = sys.argv[1:] or list(cases)
    for name in names:
        try:
            fps = bench.bench_single(cases[name])
            print(f"{name}: {fps:.1f} FPS", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
