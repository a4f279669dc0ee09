"""Hamming distance matrix from PACKED descriptors - Pallas TPU kernel.

Motivation (VERDICT round 1, item 10): the production matcher keeps a
``[C, 256] int8`` bipolar copy of every descriptor purely so the distance
matrix can be one MXU matmul (``ops/matching.py``).  That pool is 16 MB per
stream at C=65536 - by far the largest leaf of ``VOState`` - and matching
reads all of it every round.  Descriptors are natively ``[C, 8] uint32``
(256 packed bits): 8x smaller.

This kernel computes the same distance matrix directly from packed words:
each grid step loads a ``[TC, 8] uint32`` candidate tile (32 B/row instead
of 256 B/row of HBM traffic), unpacks it to bipolar int8 **in VMEM** with
shift/mask VPU ops, and feeds the MXU with the unpacked tile against the
(replicated, small) keypoint matrix.  Same math, an eighth of the bandwidth
and none of the persistent pool.

A pure-XLA fallback (`_hamming_packed_xla`) implements the identical
unpack+dot for CPU tests and as a safety net; `hamming_matrix_packed`
dispatches on backend.  Oracle-tested against ``matching.hamming_matrix``
in ``tests/test_matching.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

WORDS = 8  # 256 bits = 8 x uint32
BITS = 256


def unpack_bipolar(desc: jnp.ndarray) -> jnp.ndarray:
    """[..., 8] uint32 -> [..., 256] int8 in {-1, +1} (bit order: word-major,
    LSB first - must match ops/orb.py's packing)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts[None, :]) & jnp.uint32(1)
    flat = bits.reshape(desc.shape[:-1] + (BITS,))
    return (flat.astype(jnp.int8) << 1) - 1


def _hamming_packed_xla(cand_desc: jnp.ndarray, kp_bip: jnp.ndarray) -> jnp.ndarray:
    """Reference semantics: unpack then bipolar dot (one fused XLA program)."""
    a = unpack_bipolar(cand_desc)
    dot = jax.lax.dot_general(
        a, kp_bip, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (BITS - dot) // 2


# pltpu.repeat is TILE-style (measured on v5e: [0..7] x4 -> [0..7,0..7,...],
# NOT numpy's element-repeat), so the in-kernel unpack emits bits in the
# permuted order  col c -> word (c % 8), bit (c // 8).  Hamming distance is
# invariant under any fixed bit permutation applied to BOTH operands, so the
# (small, replicated) keypoint matrix is permuted once outside the kernel
# instead of fighting the layout inside it.
_TILE_PERM = np.arange(BITS)
_TILE_PERM = 32 * (_TILE_PERM % WORDS) + _TILE_PERM // WORDS  # col -> source bit


def _kernel(cand_ref, kp_ref, out_ref):
    """One candidate tile: unpack packed words -> bipolar int8 -> MXU dot.

    The unpack stays strictly 2-D; two Mosaic lowering limits shape it
    (both measured on v5e / jax 0.9 - their absence is why round 2 shipped
    this kernel un-integrated):

    - a rank-3 unpack with a merging reshape ([TC, 8, 32] -> [TC, 256])
      does not lower ("tpu.reshape ... unsupported"), hence pltpu.repeat;
    - int8 vector shifts (arith.shli on vector<...xi8>) do not legalize,
      hence the mul/sub bipolar mapping.

    ``kp_ref`` must already be column-permuted by ``_TILE_PERM`` (see
    module comment).
    """
    from jax.experimental.pallas import tpu as pltpu

    desc = cand_ref[:]  # [TC, 8] uint32
    words = pltpu.repeat(desc, repeats=32, axis=1)  # [TC, 256] tile order
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, BITS), 1) // jnp.uint32(WORDS)
    bits = (words >> shifts) & jnp.uint32(1)
    a = (bits.astype(jnp.int32) * 2 - 1).astype(jnp.int8)
    dot = jax.lax.dot_general(
        a, kp_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (BITS - dot) // 2


@functools.partial(jax.jit, static_argnames=("tile",))
def _hamming_packed_pallas(cand_desc, kp_bip, tile: int = 1024):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = cand_desc.shape[0]
    N = kp_bip.shape[0]
    assert C % tile == 0, (C, tile)
    # match the kernel's tile-order unpack (see _TILE_PERM); fused into the
    # surrounding program, negligible next to the [C, N] matmul
    kp_perm = jnp.take(kp_bip, jnp.asarray(_TILE_PERM), axis=1)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.int32),
        grid=(C // tile,),
        in_specs=[
            pl.BlockSpec((tile, WORDS), lambda i: (i, 0)),
            pl.BlockSpec((N, BITS), lambda i: (0, 0)),  # replicated
        ],
        out_specs=pl.BlockSpec((tile, N), lambda i: (i, 0)),
    )(cand_desc, kp_perm)


def hamming_matrix_packed(
    cand_desc: jnp.ndarray,  # [C, 8] uint32
    kp_bip: jnp.ndarray,  # [N, 256] int8 bipolar (keypoints are few - keep dense)
    tile: int = 1024,
) -> jnp.ndarray:
    """[C, N] int32 Hamming distances from packed candidate descriptors."""
    C = cand_desc.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and C % tile == 0 and C >= tile:
        return _hamming_packed_pallas(cand_desc, kp_bip, tile=tile)
    return _hamming_packed_xla(cand_desc, kp_bip)


# ---------------------------------------------------------------------------
# C-minor variants (round-5 pool layout: mp_desc is [8, C] - capacity on the
# lane axis, so the persistent pool and its per-frame rewrites carry ZERO
# tile padding; see mapstate.py module docstring)
# ---------------------------------------------------------------------------


def _hamming_packed_xla_T(cand_descT: jnp.ndarray, kp_bip: jnp.ndarray) -> jnp.ndarray:
    """[8, C] u32 x [N, 256] i8 -> [N, C] i32 (pure XLA: unpack then dot).

    Unpack keeps the canonical bit order (word-major, LSB first - row
    ``r = 32*w + b`` of the [256, C] bipolar plane is bit ``b`` of word
    ``w``), matching :func:`unpack_bipolar`'s flatten."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (cand_descT[:, None, :] >> shifts[None, :, None]) & jnp.uint32(1)
    a = (bits.reshape(BITS, cand_descT.shape[1]).astype(jnp.int8) << 1) - 1
    dot = jax.lax.dot_general(
        kp_bip, a, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (BITS - dot) // 2


def _kernel_T(cand_ref, kp_ref, out_ref):
    """C-minor tile: [8, TC] packed words -> [256, TC] bipolar -> MXU dot.

    ``pltpu.repeat(axis=0)`` tiles the 8 word rows 32x along sublanes
    (rows ``[w0..w7, w0..w7, ...]``), so row ``r`` holds word ``r % 8``
    shifted by ``r // 8`` - the same ``_TILE_PERM`` bit order as the
    row-major kernel; ``kp_ref`` must be column-permuted accordingly."""
    from jax.experimental.pallas import tpu as pltpu

    desc = cand_ref[:]  # [8, TC] uint32
    words = pltpu.repeat(desc, repeats=32, axis=0)  # [256, TC] tile order
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (BITS, 1), 0) // jnp.uint32(WORDS)
    bits = (words >> shifts) & jnp.uint32(1)
    a = (bits.astype(jnp.int32) * 2 - 1).astype(jnp.int8)
    dot = jax.lax.dot_general(
        kp_ref[:], a, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (BITS - dot) // 2


@functools.partial(jax.jit, static_argnames=("tile",))
def _hamming_packed_pallas_T(cand_descT, kp_bip, tile: int = 1024):
    from jax.experimental import pallas as pl

    C = cand_descT.shape[1]
    N = kp_bip.shape[0]
    assert C % tile == 0, (C, tile)
    kp_perm = jnp.take(kp_bip, jnp.asarray(_TILE_PERM), axis=1)
    return pl.pallas_call(
        _kernel_T,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.int32),
        grid=(C // tile,),
        in_specs=[
            pl.BlockSpec((WORDS, tile), lambda i: (0, i)),
            pl.BlockSpec((N, BITS), lambda i: (0, 0)),  # replicated
        ],
        out_specs=pl.BlockSpec((N, tile), lambda i: (0, i)),
    )(cand_descT, kp_perm)


def hamming_matrix_packed_T(
    cand_descT: jnp.ndarray,  # [8, C] uint32 (the C-minor mp_desc pool)
    kp_bip: jnp.ndarray,  # [N, 256] int8 bipolar
    tile: int = 1024,
) -> jnp.ndarray:
    """[N, C] int32 Hamming distances from the C-minor packed pool."""
    C = cand_descT.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and C % tile == 0 and C >= tile:
        return _hamming_packed_pallas_T(cand_descT, kp_bip, tile=tile)
    return _hamming_packed_xla_T(cand_descT, kp_bip)
