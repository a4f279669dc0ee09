"""Depth-map lookup with 4-neighbor fallback, vectorized over keypoints.

Equivalent of ``Frame::GetDepth`` (``src/frame.cpp:43-67``): round the
keypoint to integer pixel coordinates, read the raw 16-bit depth, fall back
to the 4-neighborhood if the center reading is zero, convert to meters with
``depth_scale``, and report invalid (the reference returns -1) when no
reading exists.  Unlike the reference (which indexes out of bounds at the
image border, SURVEY.md section 7 "known quirks"), coordinates are clamped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DepthLookup(NamedTuple):
    depth: jnp.ndarray  # [N] float32 meters (0 where invalid)
    valid: jnp.ndarray  # [N] bool


# center first, then the reference's probe order dx={-1,0,1,0}, dy={0,-1,0,1}
_PROBES = ((0, 0), (-1, 0), (0, -1), (1, 0), (0, 1))


def lookup_depth(
    depth_img: jnp.ndarray,  # [H, W] uint16 raw depth
    xy: jnp.ndarray,  # [N, 2] float32 keypoint coords (x, y)
    depth_scale: jnp.ndarray,
) -> DepthLookup:
    h, w = depth_img.shape
    x = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, h - 1)

    raw = jnp.zeros(xy.shape[:-1], dtype=jnp.int32)
    for dx, dy in _PROBES:
        xs = jnp.clip(x + dx, 0, w - 1)
        ys = jnp.clip(y + dy, 0, h - 1)
        probe = depth_img[ys, xs].astype(jnp.int32)
        # keep the first non-zero reading in probe order
        raw = jnp.where(raw != 0, raw, probe)

    valid = raw != 0
    meters = raw.astype(jnp.float32) / depth_scale
    return DepthLookup(depth=jnp.where(valid, meters, 0.0), valid=valid)
