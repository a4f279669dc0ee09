"""Run the TPU-only parity subset on the REAL chip and emit a JSON report.

The pytest suite is CPU-forced (tests/conftest.py) so the device-specific
paths — the Pallas packed-Hamming kernel (`ops/pallas_match.py`), the Pallas
fused FAST+NMS kernel (`ops/pallas_fast.py`, compiled, not interpret-mode),
and the bf16 descriptor narrowings — are asserted here on hardware.  The two
subprocess-based pytest tests (`tests/test_orb.py -k on_tpu`) cover the bf16
paths; this script re-checks them in-process and adds the kernels the suite
can only interpret.

Usage (TPU attached):   python benchmarks/tpu_parity_run.py
Writes benchmarks/tpu_tests_r<N>.json via --out.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def check_packed_matching(report: dict) -> None:
    """Pallas packed-Hamming kernel vs numpy popcount oracle at production
    shape (C=65536 candidates x N=512 keypoints, the fr1 preset's pool)."""
    from rgbd_visualodometry_tpu.ops.pallas_match import (
        hamming_matrix_packed,
        _hamming_packed_pallas,
    )

    rng = np.random.default_rng(0)
    C, N = 65536, 512
    packed = rng.integers(0, 2**32, size=(C, 8), dtype=np.uint32)
    kp_bits = rng.integers(0, 2, size=(N, 256)).astype(np.int8)
    kp_bip = (kp_bits * 2 - 1).astype(np.int8)

    # stage operands on device once: the chip sits behind a tunnel, so a
    # fresh host->device upload per call would masquerade as kernel time
    packed_dev = jax.block_until_ready(jnp.asarray(packed))
    kp_dev = jax.block_until_ready(jnp.asarray(kp_bip))
    t0 = time.perf_counter()
    d_dev = hamming_matrix_packed(packed_dev, kp_dev)
    d_dev = np.asarray(jax.block_until_ready(d_dev))
    t_first = time.perf_counter() - t0

    # numpy popcount oracle; packing in ops/orb.py is LSB-first per word
    shifts = np.arange(32, dtype=np.uint32)
    bits = ((packed[:, :, None] >> shifts[None, None, :]) & 1).astype(np.uint8)
    cand_bits = bits.reshape(C, 256)
    want = np.empty((C, N), np.int32)  # chunked: the dense broadcast is 8 GiB
    for s in range(0, C, 4096):
        e = s + 4096
        want[s:e] = (cand_bits[s:e, None, :] != kp_bits[None, :, :]).sum(
            -1, dtype=np.int32
        )

    exact = bool((d_dev == want).all())
    # confirm the pallas path (not the XLA fallback) was what we measured
    d_pal = np.asarray(
        jax.block_until_ready(_hamming_packed_pallas(packed_dev, kp_dev))
    )
    pallas_exact = bool((d_pal == want).all())
    # steady-state timing of the jitted kernel (device-resident operands;
    # the [C, N] result stays on device - only the last call materializes)
    t0 = time.perf_counter()
    for _ in range(10):
        out = _hamming_packed_pallas(packed_dev, kp_dev)
    jax.block_until_ready(out)
    t_steady = (time.perf_counter() - t0) / 10

    report["packed_matching_pallas_65536x512"] = {
        "exact": exact,
        "pallas_kernel_exact": pallas_exact,
        "first_call_s": round(t_first, 3),
        "steady_ms": round(t_steady * 1e3, 3),
    }
    assert exact and pallas_exact


def check_pallas_fast(report: dict) -> None:
    """Compiled (non-interpret) fused FAST+NMS kernel vs the XLA reference
    on the same device — the suite only ever interprets it on CPU."""
    from rgbd_visualodometry_tpu.ops import fast, image as im, pallas_fast

    rng = np.random.default_rng(0)
    img = np.zeros((480, 640), np.float32)
    for _ in range(120):
        y, x = rng.integers(5, 460), rng.integers(5, 620)
        h, w = rng.integers(5, 24, 2)
        img[y : y + h, x : x + w] += rng.uniform(30, 120)
    img = np.clip(img + rng.normal(0, 2, img.shape), 0, 255).astype(np.float32)
    jimg = jnp.asarray(img)

    got = np.asarray(jax.block_until_ready(pallas_fast.fast_score_nms(jimg)))
    score = fast.fast_score(jimg)
    nms = score >= im.maxpool3x3(score)
    want = np.asarray(jnp.where(nms, score, 0.0))
    ok = bool(np.allclose(got[1:-1, 1:-1], want[1:-1, 1:-1], atol=1e-4))
    report["pallas_fast_compiled_640x480"] = {"exact_interior": ok}
    assert ok


def check_bf16_descriptors(report: dict) -> None:
    """bf16 BRIEF matmul + bf16 patch canvas vs the f32 path on device
    (same contracts as tests/test_orb.py's on-TPU subprocess tests)."""
    from rgbd_visualodometry_tpu.ops import orb

    rng = np.random.default_rng(3)
    img = np.zeros((240, 320), np.float32)
    for _ in range(80):
        y, x = rng.integers(10, 220), rng.integers(10, 300)
        h, w = rng.integers(8, 30, 2)
        img[y : y + h, x : x + w] += rng.uniform(30, 120)
    img = np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype(np.float32)
    jimg = jnp.asarray(img)

    for name, kw in (
        ("brief_bf16", dict(use_bf16=True)),
        ("patch_bf16", dict(patch_bf16=True)),
    ):
        f_a = orb.extract(jimg, nfeatures=200, nlevels=4, **kw)
        f_b = orb.extract(
            jimg,
            nfeatures=200,
            nlevels=4,
            **{k: False for k in kw},
        )
        same_xy = bool(np.array_equal(np.asarray(f_a.xy), np.asarray(f_b.xy)))
        v = np.asarray(f_a.valid) & np.asarray(f_b.valid)
        a = np.asarray(f_a.desc)[v]
        b = np.asarray(f_b.desc)[v]
        flips = int(np.unpackbits((a ^ b).view(np.uint8), axis=-1).sum())
        frac = flips / (int(v.sum()) * 256.0)
        report[name] = {
            "same_keypoints": same_xy,
            "bit_flip_fraction": round(frac, 6),
        }
        assert same_xy and frac < 0.015, (name, frac)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from rgbd_visualodometry_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    report = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "commit": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=__file__.rsplit("/", 2)[0],
        ).stdout.strip(),
    }
    if backend != "tpu":
        print(json.dumps({**report, "skipped": "no TPU attached"}))
        sys.exit(0)

    check_packed_matching(report)
    check_pallas_fast(report)
    check_bf16_descriptors(report)
    report["ok"] = True

    out = json.dumps(report, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
