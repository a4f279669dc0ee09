"""Round-5: verify the C-minor pool layout landed physically.

The round-4 HLO scan (``profile_r4_hlo.py`` / ``round4_tpu_runs.md``) showed
the row-major pools lowered as ``T(8,128)`` tiles with the size-2/3 minor
dims padded to 128 lanes - 42-64x physical blowup on ``mp_pos [C, 3]`` /
``obs_uv [C, M, 2]``.  After the mapstate C-minor refactor this script
proves, independently of any clock:

1. ``compiled.memory_analysis()`` argument/output/temp byte totals of the
   real S=72 multistream compute/update programs (buffer-assignment sizes -
   physical, padding included), and
2. an HLO parameter-layout scan of the update program: every pool leaf's
   entry layout, flagging any whose padded physical size exceeds its
   logical size by more than 4x (the bool planes' int8 sublane pad).

Run on the real chip: ``python benchmarks/profile_r5_layout_check.py``.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import bench
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.parallel import MultiStreamVO, make_mesh
from rgbd_visualodometry_tpu.utils import enable_compilation_cache


def report(tag, lowered_fn, *args):
    compiled = lowered_fn.lower(*args).compile()
    ma = compiled.memory_analysis()
    gb = 1024 ** 3
    if ma is None or not hasattr(ma, "temp_size_in_bytes"):
        print(f"{tag}: memory_analysis unavailable on this backend", flush=True)
        return compiled
    print(
        f"{tag}: args={ma.argument_size_in_bytes/gb:.3f} GiB  "
        f"out={ma.output_size_in_bytes/gb:.3f} GiB  "
        f"temp={ma.temp_size_in_bytes/gb:.3f} GiB  "
        f"alias={ma.alias_size_in_bytes/gb:.3f} GiB",
        flush=True,
    )
    return compiled


_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1,
                "bf16": 2, "f16": 2, "u16": 2, "s16": 2}


def scan_entry_layouts(txt):
    """Parse ENTRY parameter/result shapes like
    ``f32[72,3,16384]{2,1,0:T(8,128)}`` and report physical/logical ratios."""
    pat = re.compile(r"(\w+)\[([\d,]+)\]\{([\d,]+)(?::T\(([\d,]+)\))?")
    seen = {}
    for m in pat.finditer(txt):
        dt, dims_s, _, tile_s = m.groups()
        if dt not in _DTYPE_BYTES:
            continue
        dims = [int(d) for d in dims_s.split(",")]
        if not tile_s or len(dims) < 2:
            continue
        tile = [int(t) for t in tile_s.split(",")]
        phys = list(dims)
        # tiling pads the trailing len(tile) dims up to tile multiples
        for i, t in enumerate(tile):
            j = len(dims) - len(tile) + i
            phys[j] = -(-dims[j] // t) * t
        logical = int(np.prod(dims)) * _DTYPE_BYTES[dt]
        physical = int(np.prod(phys)) * _DTYPE_BYTES[dt]
        key = f"{dt}[{dims_s}]:T({tile_s})"
        if logical >= 1 << 20:  # only pool-scale buffers
            seen[key] = (logical, physical)
    return seen


def main():
    enable_compilation_cache()
    S = 72
    cfg = bench.multistream_cfg(VOConfig(), full_vo=True)
    print(
        f"device={jax.devices()[0]}  S={S}  C={cfg.max_mappoints}  "
        f"M={cfg.max_obs_per_mappoint}  K={cfg.max_keyframes}", flush=True,
    )
    vo = MultiStreamVO(cfg, n_streams=S, mesh=make_mesh(1))
    seqs = [bench._make_frames(cfg, 1, seed=s) for s in range(S)]
    fb = vo.put_batch(
        np.stack([sq[0].rgb for sq in seqs]),
        np.stack([sq[0].depth for sq in seqs]),
        np.asarray([sq[0].timestamp for sq in seqs]),
    )

    logical = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree.leaves(vo.states)
    )
    print(f"logical state size: {logical/1024**3:.3f} GiB", flush=True)

    report("compute", vo._compute, vo.states, fb)
    it = vo._compute(vo.states, fb)
    compiled = report("update ", vo._update, vo.states, it)

    txt = compiled.as_text()

    # The REGRESSION GATE scans only the entry computation layout (the
    # buffers that actually persist across steps - the state pools).
    # Fusion-internal shapes elsewhere in the HLO text carry layout
    # annotations too but never materialize in HBM, so they must not trip
    # the gate (the first version of this script scanned the whole text and
    # false-flagged 32-256x "blowups" on fused temporaries).
    m = re.search(r"entry_computation_layout=\{(.*?)\}\s*$", txt, re.M | re.S)
    entry_txt = m.group(1) if m else txt.split("ENTRY", 1)[0]
    print("\nENTRY-layout >=1MiB tiled buffers (physical/logical) - the gate:")
    worst = 1.0
    for key, (lo, ph) in sorted(
        scan_entry_layouts(entry_txt).items(), key=lambda kv: -kv[1][1]
    ):
        ratio = ph / lo
        worst = max(worst, ratio)
        print(f"  {key:48s} {lo/1024**2:9.2f} MiB -> {ph/1024**2:9.2f} MiB  ({ratio:.1f}x)")
    print(f"\nworst ENTRY physical/logical ratio: {worst:.1f}x "
          f"({'OK - no pool blowup' if worst <= 4.01 else 'LAYOUT REGRESSION'})")

    # informational: whole-text scan (includes fusion-internal shapes that
    # may or may not materialize - NOT a regression signal)
    print("\nwhole-HLO >=1MiB tiled shapes (informational only):")
    for key, (lo, ph) in sorted(
        scan_entry_layouts(txt).items(), key=lambda kv: -kv[1][1]
    )[:12]:
        print(f"  {key:48s} {lo/1024**2:9.2f} MiB -> {ph/1024**2:9.2f} MiB  ({ph/lo:.1f}x)")


if __name__ == "__main__":
    main()
