"""Round-3 continuation sweep: new knobs (coarse lightening, patch bf16) +
stream scaling on the final mcfg, + single-stream triangulation_batch.
Usage: python benchmarks/sweep_r3_knobs.py [labels...]
"""
import importlib.util
import sys

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.utils import enable_compilation_cache

enable_compilation_cache()
cfg = VOConfig()
orig_mcfg = bench.multistream_cfg
ONLY = sys.argv[1:]

MS = [
    # (label, streams, mcfg overrides)
    ("ms72-base", 72, {}),
    ("ms72-coarse", 72, dict(coarse_ransac_hypotheses=16, coarse_pose_ba_iterations=4)),
    ("ms72-patchbf16", 72, dict(orb_patch_bf16=True)),
    ("ms72-both", 72, dict(coarse_ransac_hypotheses=16, coarse_pose_ba_iterations=4, orb_patch_bf16=True)),
    ("ms72-bins60", 72, dict(orb_angle_bins=60)),
    ("ms72-bins30", 72, dict(orb_angle_bins=30)),
    ("ms72-all3", 72, dict(coarse_ransac_hypotheses=16, coarse_pose_ba_iterations=4, orb_patch_bf16=True, orb_angle_bins=60)),
    ("ms72-all3-bins30", 72, dict(coarse_ransac_hypotheses=16, coarse_pose_ba_iterations=4, orb_patch_bf16=True, orb_angle_bins=30)),
    ("ms80-both", 80, dict(coarse_ransac_hypotheses=16, coarse_pose_ba_iterations=4, orb_patch_bf16=True)),
    ("ms96-both", 96, dict(coarse_ransac_hypotheses=16, coarse_pose_ba_iterations=4, orb_patch_bf16=True)),
]

for label, streams, kw in MS:
    if ONLY and label not in ONLY:
        continue
    bench.multistream_cfg = lambda c, full_vo=False, _kw=kw: orig_mcfg(
        c, full_vo=full_vo
    ).replace(**_kw)
    try:
        fps = bench.bench_multistream(cfg, streams, full_vo=True)
        print(f"{label}: {fps:.2f} FPS = {fps/bench.BASELINE_FPS_FULL_VO:.2f}x baseline", flush=True)
    except Exception as e:
        msg = str(e)[:160].replace("\n", " ")
        print(f"{label}: FAILED {type(e).__name__}: {msg}", flush=True)
        if "RESOURCE_EXHAUSTED" not in str(e):
            break
bench.multistream_cfg = orig_mcfg

SS = [
    ("single-tri256", dict(triangulation_batch=256)),
    ("single-tri256-coarse", dict(triangulation_batch=256, coarse_ransac_hypotheses=16, coarse_pose_ba_iterations=4)),
    ("single-base", dict()),
    ("single-bins60", dict(orb_angle_bins=60)),
]
for label, kw in SS:
    if ONLY and label not in ONLY:
        continue
    try:
        fps = bench.bench_single(cfg.replace(**kw))
        print(f"{label}: {fps:.2f} FPS = {fps/bench.BASELINE_FPS_FULL_VO:.2f}x baseline", flush=True)
    except Exception as e:
        msg = str(e)[:160].replace("\n", " ")
        print(f"{label}: FAILED {type(e).__name__}: {msg}", flush=True)
