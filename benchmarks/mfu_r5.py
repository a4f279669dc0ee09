"""Round-5: MFU / roofline accounting for the official bench workloads
(VERDICT r4 task 4).

For each production program this prints XLA's own cost model numbers
(``compiled.cost_analysis()``: flops, bytes accessed) and the
buffer-assignment sizes (``memory_analysis()``), then divides by the
MEASURED steady-state step time to get achieved TFLOP/s and HBM GB/s as a
fraction of v5e peak:

- v5e peak compute: 197 TFLOP/s bf16 / 394 TOP/s int8 (public spec)
- v5e peak HBM bandwidth: 819 GB/s

Programs covered (the exact jitted programs the bench dispatches):

1. single-stream fused ``track_step`` at ``bench.single_stream_cfg``
2. 72-stream vmapped ``track_compute`` (the tracking-compute half)
3. 72-stream vmapped ``apply_updates`` (the state-update half)
4. 72-stream vmapped pred-masked ``ba_step``

Step times are passed on the command line (seconds) or default to the
round-5 official medians; the table lands in ``benchmarks/mfu_r5.md``
notes.  Usage on the chip::

    python benchmarks/mfu_r5.py [t_single t_ms_compute t_ms_update t_ms_ba]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import bench
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.parallel import MultiStreamVO, make_mesh
from rgbd_visualodometry_tpu.pipeline.system import VisualOdometry
from rgbd_visualodometry_tpu.utils import enable_compilation_cache

PEAK_TFLOPS_BF16 = 197.0
PEAK_HBM_GBS = 819.0


def analyze(tag, compiled, step_s, frames_per_step):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    ca = ca or {}
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    ma = compiled.memory_analysis()
    arg_b = getattr(ma, "argument_size_in_bytes", 0) if ma else 0
    out_b = getattr(ma, "output_size_in_bytes", 0) if ma else 0
    tmp_b = getattr(ma, "temp_size_in_bytes", 0) if ma else 0
    row = {
        "program": tag,
        "gflops": flops / 1e9,
        "bytes_GB": byts / 1e9,
        "args_GB": arg_b / 1e9,
        "out_GB": out_b / 1e9,
        "temp_GB": tmp_b / 1e9,
        "step_ms": step_s * 1e3,
        "achieved_tflops": flops / step_s / 1e12 if step_s else 0.0,
        "mfu_pct": 100 * flops / step_s / 1e12 / PEAK_TFLOPS_BF16 if step_s else 0.0,
        "achieved_GBs": byts / step_s / 1e9 if step_s else 0.0,
        "hbm_pct": 100 * byts / step_s / 1e9 / PEAK_HBM_GBS if step_s else 0.0,
        "per_frame_gflop": flops / 1e9 / frames_per_step,
        "per_frame_MB": byts / 1e6 / frames_per_step,
    }
    print(
        f"{tag:28s} {row['gflops']:9.2f} GF {row['bytes_GB']:8.3f} GB  "
        f"@{row['step_ms']:7.1f} ms -> {row['achieved_tflops']:6.2f} TF/s "
        f"({row['mfu_pct']:4.1f}% MXU)  {row['achieved_GBs']:6.1f} GB/s "
        f"({row['hbm_pct']:4.1f}% HBM)", flush=True,
    )
    return row


def main():
    enable_compilation_cache()
    args = [float(a) for a in sys.argv[1:]]
    cfg = VOConfig()

    # ---- 1. single-stream fused track_step ---------------------------------
    scfg = bench.single_stream_cfg(cfg)
    vo = VisualOdometry(scfg)
    seq = bench._make_frames(scfg, 1)
    f = vo.put_frame(seq[0].rgb, seq[0].depth, seq[0].timestamp)
    t_single = args[0] if len(args) > 0 else 1.0 / 162.4  # r5 official median
    single_c = vo._step.lower(vo.state, f).compile()

    # ---- 2-4. 72-stream programs -------------------------------------------
    S = 72
    mcfg = bench.multistream_cfg(cfg, full_vo=True)
    mvo = MultiStreamVO(mcfg, n_streams=S, mesh=make_mesh(1))
    seqs = [bench._make_frames(mcfg, 1, seed=s) for s in range(S)]
    fb = mvo.put_batch(
        np.stack([sq[0].rgb for sq in seqs]),
        np.stack([sq[0].depth for sq in seqs]),
        np.asarray([sq[0].timestamp for sq in seqs]),
    )
    # compute/update wall splits come from profile_r4_stagesplit (re-run on
    # the r5 layout); BA per-dispatch wall from the same profile's full-step
    # minus compute+update delta times (gap+1) steps per dispatch
    t_compute = args[1] if len(args) > 1 else 0.20
    t_update = args[2] if len(args) > 2 else 0.13
    t_ba = args[3] if len(args) > 3 else 0.10

    compute_c = mvo._compute.lower(mvo.states, fb).compile()
    it = mvo._compute(mvo.states, fb)
    update_c = mvo._update.lower(mvo.states, it).compile()
    import jax.numpy as jnp

    kf = jnp.zeros((S,), jnp.int32)
    pred = jnp.zeros((S,), bool)
    ba_c = mvo._ba.lower(mvo.states, kf, pred).compile()

    print(f"device={jax.devices()[0]}  peaks: {PEAK_TFLOPS_BF16} TF/s bf16, "
          f"{PEAK_HBM_GBS} GB/s HBM\n", flush=True)
    rows = [
        analyze("single track_step", single_c, t_single, 1),
        analyze(f"{S}-stream compute", compute_c, t_compute, S),
        analyze(f"{S}-stream update", update_c, t_update, S),
        analyze(f"{S}-stream BA (x1/{mcfg.ba_min_frame_gap + 1} steps)", ba_c, t_ba, S * (mcfg.ba_min_frame_gap + 1)),
    ]
    import json
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mfu_r5.json")
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(rows, fh, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
