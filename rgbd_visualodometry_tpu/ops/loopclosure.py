"""Loop-closure pose-graph construction from the map's observation table.

Net-new capability beyond the reference (its backend only ever re-solves
the local covisible window, ``src/backend.cpp:19-195``; a revisit is never
used to undo accumulated drift).  The key observation: because tracking
matches every frame against the PERSISTENT map (the reference's
``trackingMap_`` idea, ``src/mapmanager.cpp:14-38``), a camera revisiting a
mapped area re-associates the OLD mappoints, and the new keyframe's
observation rows link it directly to temporally-distant keyframes.  The
co-observation structure therefore already *contains* the loop closures -
no separate bag-of-words detector is needed.

Each observation stores the measured pixel + raw depth
(``mapstate.VOState.obs_uv/obs_depth``), so two keyframes observing the
same mappoint yield an INDEPENDENT 3D-3D correspondence between their
camera frames (back-projected measurements, not the shared map position).
For every keyframe pair this module accumulates weighted Kabsch moments
and solves Horn's closed form per pair, producing a relative-pose edge
``T_i^{-1} T_j`` ready for ``ops/posegraph.optimize_pose_graph``.

TPU-first shape:

- ONE pass over the ``[C, M]`` observation table, chunked with
  ``lax.scan`` (bounded memory), building all ``M x M`` within-row pairs
  and scatter-adding their moments into dense ``[K, K]`` accumulators
  (K = keyframe capacity, small: the whole accumulator set is ~3 MB at
  K=256).  No per-pair gathering, no data-dependent shapes.
- Per-pair rotation comes from the accumulated cross-covariance via the
  same Jacobi 4x4 eigensolver the PnP path uses
  (``ops/smalleig.horn_quat_from_crosscov``) - a batched closed form, no
  iteration.
- Edge compaction (dropping pairs below ``min_shared``) happens on the
  host: graph construction is offline post-processing, and a compacted
  edge list keeps the downstream Gauss-Newton dense-block assembly small.

Edge weights are the clamped co-observation counts: the pose-graph
solver's robust kernel needs weights bounded relative to the odometry
chain (measured requirement, see ``ops/posegraph.py`` module docstring),
so a 500-point pair must not get 50x the influence of a 10-point pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu import camera as camera_mod
from rgbd_visualodometry_tpu.ops import se3
from rgbd_visualodometry_tpu.ops.posegraph import PoseGraph
from rgbd_visualodometry_tpu.ops.smalleig import horn_quat_from_crosscov


@partial(jax.jit, static_argnames=("chunk_rows",))
def coobservation_moments(state, cam, chunk_rows: int = 2048):
    """Weighted Kabsch moments for every ordered keyframe pair (i < j).

    For each mappoint row, every pair of depth-valid observations
    ``(m1, m2)`` with ``obs_kf[m1] < obs_kf[m2]`` contributes one 3D-3D
    correspondence ``a = backproject(obs m1)`` in keyframe i's camera
    frame, ``b = backproject(obs m2)`` in keyframe j's:

    Returns ``(cnt[K, K], sa[K, K, 3], sb[K, K, 3], mba[K, K, 3, 3])``::

        cnt[i, j] = sum w        sa[i, j] = sum w * a
        sb[i, j]  = sum w * b    mba[i, j, α, β] = sum w * b_α * a_β

    (w = 1 per correspondence today; the layout supports any per-obs
    weighting.)  Chunked ``lax.scan`` over mappoint rows bounds the
    transient at ``chunk_rows * M^2`` pair items.
    """
    K = state.kf_pose.shape[0]
    C, M = state.obs_kf.shape
    n_chunks = -(-C // chunk_rows)
    pad = n_chunks * chunk_rows - C

    def padded(x, fill):
        if pad == 0:
            return x
        tail = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, tail])

    kf = padded(state.obs_kf, -1).reshape(n_chunks, chunk_rows, M)
    uv = padded(state.obs_uv, 0.0).reshape(n_chunks, chunk_rows, M, 2)
    dep = padded(state.obs_depth, 0.0).reshape(n_chunks, chunk_rows, M)
    val = padded(state.obs_valid, False).reshape(n_chunks, chunk_rows, M)

    def body(acc, inp):
        cnt, sa, sb, mba = acc
        kf_c, uv_c, dep_c, val_c = inp
        ok = val_c & (dep_c > 0.0) & (kf_c >= 0)
        p = camera_mod.pixel2camera(cam, uv_c, dep_c)  # [B, M, 3]
        i_id = kf_c[:, :, None]  # keyframe of slot m1 -> point 'a'
        j_id = kf_c[:, None, :]  # keyframe of slot m2 -> point 'b'
        # i < j canonicalizes each unordered pair exactly once (slot ids
        # within one row are distinct: one observation per keyframe)
        w = (ok[:, :, None] & ok[:, None, :] & (i_id < j_id)).astype(
            jnp.float32
        )  # [B, M, M]
        pshape = w.shape + (3,)
        a = jnp.broadcast_to(p[:, :, None, :], pshape)
        b = jnp.broadcast_to(p[:, None, :, :], pshape)
        idx_i = jnp.clip(jnp.broadcast_to(i_id, w.shape), 0, K - 1).reshape(-1)
        idx_j = jnp.clip(jnp.broadcast_to(j_id, w.shape), 0, K - 1).reshape(-1)
        wf = w.reshape(-1)
        af = a.reshape(-1, 3)
        bwf = (b * w[..., None]).reshape(-1, 3)  # weight folded in once
        cnt = cnt.at[idx_i, idx_j].add(wf)
        sa = sa.at[idx_i, idx_j].add(af * wf[:, None])
        sb = sb.at[idx_i, idx_j].add(bwf)
        mba = mba.at[idx_i, idx_j].add(jnp.einsum("na,nb->nab", bwf, af))
        return (cnt, sa, sb, mba), None

    f32 = jnp.float32
    init = (
        jnp.zeros((K, K), f32),
        jnp.zeros((K, K, 3), f32),
        jnp.zeros((K, K, 3), f32),
        jnp.zeros((K, K, 3, 3), f32),
    )
    (cnt, sa, sb, mba), _ = jax.lax.scan(body, init, (kf, uv, dep, val))
    return cnt, sa, sb, mba


@jax.jit
def kabsch_from_moments(cnt, sa, sb, mba) -> jnp.ndarray:
    """Weighted Horn alignment from accumulated moments (batched).

    Solves ``a ~= R b + t`` - maps keyframe-j camera coordinates into
    keyframe i's - which in the package's T_w_c pose-graph convention IS
    the edge measurement ``T_i^{-1} T_j``
    (``ops/posegraph.relative_measurement``).
    """
    w = jnp.maximum(cnt, 1e-9)[..., None]
    abar = sa / w
    bbar = sb / w
    # centered cross-covariance with world = b, cam = a
    S = mba - cnt[..., None, None] * bbar[..., :, None] * abar[..., None, :]
    q = horn_quat_from_crosscov(S)
    t = abar - se3.quat_rotate(q, bbar)
    return se3.make(q, t)


def empty_graph() -> PoseGraph:
    return PoseGraph(
        edge_i=jnp.zeros((0,), jnp.int32),
        edge_j=jnp.zeros((0,), jnp.int32),
        edge_meas=jnp.zeros((0, 7), jnp.float32),
        edge_weight=jnp.zeros((0,), jnp.float32),
        edge_valid=jnp.zeros((0,), bool),
    )


def build_coobservation_graph(
    state,
    cam,
    *,
    min_shared: int = 8,
    max_pair_weight: float = 30.0,
    chunk_rows: int = 2048,
) -> PoseGraph:
    """Compact edge list over all keyframe pairs sharing >= ``min_shared``
    depth-valid observations.  Host-compacted (offline post-processing):
    only surviving pairs pay the per-edge Kabsch + downstream Jacobians.

    ``min_shared`` doubles as the geometric-degeneracy guard: Horn's
    rotation needs a non-collinear point spread, and a pair that genuinely
    co-observes 8+ well-distributed FAST corners is overwhelmingly
    non-degenerate; the solver's redescending kernel + chi2 prune
    (``ops/posegraph.optimize_pose_graph``) absorbs the rare bad edge.
    """
    cnt, sa, sb, mba = coobservation_moments(state, cam, chunk_rows=chunk_rows)
    cnt_h = np.asarray(cnt)
    ii, jj = np.nonzero(cnt_h >= float(min_shared))
    if ii.size == 0:
        return empty_graph()
    meas = kabsch_from_moments(cnt[ii, jj], sa[ii, jj], sb[ii, jj], mba[ii, jj])
    weight = np.minimum(cnt_h[ii, jj], float(max_pair_weight))
    return PoseGraph(
        edge_i=jnp.asarray(ii, jnp.int32),
        edge_j=jnp.asarray(jj, jnp.int32),
        edge_meas=meas,
        edge_weight=jnp.asarray(weight, jnp.float32),
        edge_valid=jnp.ones((ii.size,), bool),
    )
