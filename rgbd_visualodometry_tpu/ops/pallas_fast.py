"""Pallas TPU kernel: fused FAST-9 corner score + 3x3 non-max suppression.

The pure-XLA formulation in :mod:`rgbd_visualodometry_tpu.ops.fast` builds
16 shifted copies of the image and ~160 elementwise stages; XLA fuses them,
but every stage boundary that does materialize costs an HBM round trip.
This kernel keeps the whole pyramid level resident in VMEM (a 640x480 f32
image is 1.2 MB against ~16 MB of VMEM) and emits the NMS'd corner-score
map in a single pass: load once, ~200 VPU ops per pixel, store once.

The kernel grid walks row bands so the compiler gets clean (8, 128)-aligned
tiles; each band reads a 3-row halo for the circle taps and NMS window.
Numerics are bit-identical to ``fast.fast_score`` + ``maxpool3x3`` (asserted
in tests, which run this kernel in interpreter mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgbd_visualodometry_tpu.ops.fast import _CIRCLE, ARC_LENGTH

_HALO = 4  # 3 px circle radius + 1 px NMS window


def _fast_nms_kernel(img_ref, out_ref, *, band: int, h: int, w: int):
    """img_ref: [H + 2*_HALO, W + 2*_HALO] padded image (VMEM resident).
    out_ref: [band, W] NMS'd FAST score for this row band."""
    i = pl.program_id(0)
    row0 = i * band  # first output row of this band

    # Load the band plus halo: rows [row0, row0 + band + 2*_HALO)
    tile = img_ref[pl.ds(row0, band + 2 * _HALO), :]

    # Compute the score over the tile interior [band + 2, w + 2] so a 3x3
    # NMS window around every output pixel is available.
    ih = band + 2
    iw = w + 2
    center = tile[_HALO - 1 : _HALO - 1 + ih, _HALO - 1 : _HALO - 1 + iw]
    neg_big = jnp.asarray(-jnp.inf, center.dtype)

    diffs = [
        tile[
            _HALO - 1 + dy : _HALO - 1 + dy + ih,
            _HALO - 1 + dx : _HALO - 1 + dx + iw,
        ]
        - center
        for dy, dx in _CIRCLE
    ]
    doubled = diffs + diffs[: ARC_LENGTH - 1]
    bright = jnp.full_like(center, neg_big)
    dark = jnp.full_like(center, neg_big)
    for s in range(16):
        arc_min = doubled[s]
        arc_max = doubled[s]
        for k in range(1, ARC_LENGTH):
            arc_min = jnp.minimum(arc_min, doubled[s + k])
            arc_max = jnp.maximum(arc_max, doubled[s + k])
        bright = jnp.maximum(bright, arc_min)  # all-brighter arc
        dark = jnp.maximum(dark, -arc_max)  # all-darker arc
    score = jnp.maximum(jnp.maximum(bright, dark), 0.0)  # [band + 2, w + 2]

    # fused 3x3 NMS: keep score where it is the window max
    m = score[0:band, 0:w]
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            m = jnp.maximum(m, score[dy : dy + band, dx : dx + w])
    inner = score[1 : 1 + band, 1 : 1 + w]
    out_ref[:, :] = jnp.where(inner >= m, inner, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_score_nms(gray: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """NMS'd FAST-9 score map [H, W]: value = corner score where the pixel
    is a local 3x3 maximum, else 0.  Equivalent to
    ``where(s >= maxpool3x3(s), s, 0)`` with ``s = fast.fast_score(gray)``.
    """
    h, w = gray.shape
    band = 64
    hp = -(-h // band) * band  # rows padded so every band tiles (8, 128)-clean
    padded = jnp.pad(
        gray, ((_HALO, _HALO + (hp - h)), (_HALO, _HALO)), mode="edge"
    )

    out = pl.pallas_call(
        functools.partial(_fast_nms_kernel, band=band, h=hp, w=w),
        grid=(hp // band,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (band, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((hp, w), gray.dtype),
        interpret=interpret,
    )(padded)
    return out[:h]
