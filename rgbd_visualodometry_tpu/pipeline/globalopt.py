"""Offline global map refinement: loop-closure graph + SE(3) relaxation.

Net-new vs the reference, whose optimizer never revisits poses outside the
local covisible window (``src/backend.cpp:19-195``) - accumulated drift is
permanent there.  This module glues the two building blocks into one
user-facing operation on a live ``VOState``:

1. ``ops/loopclosure.build_coobservation_graph`` - relative-pose edges
   from every keyframe pair sharing depth-valid observations (revisits
   included, because tracking re-associates old mappoints from the
   persistent map);
2. ``ops/loopclosure.build_appearance_graph`` (``appearance=True``) -
   place-recognition edges for revisits that DUPLICATED landmarks
   instead of re-associating (no shared rows: invisible to 1.);
3. ``ops/posegraph.optimize_pose_graph`` - robust damped Gauss-Newton on
   the whole keyframe graph.

After relaxation the map deforms rigidly with its anchors: every mappoint
moves with the keyframe of its first observation, and the tracking
reference (``prev_pose``) moves with the current reference keyframe, so a
mid-run relaxation hands tracking a coherent world.

Typical use (also reachable as ``rgbd-vo --global-relax``)::

    vo.run(frames, trajectory_path="traj.txt")
    report = vo.global_relax()
    # report.kf_ts / old_T_w_k / new_T_w_k feed correct_trajectory()
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu.camera import Camera
from rgbd_visualodometry_tpu.ops import loopclosure, posegraph, se3


@dataclass
class RelaxReport:
    """What the relaxation did, plus the keyframe delta table needed to
    correct an already-written per-frame trajectory."""

    num_edges: int  # co-observation edges in the graph
    num_loop_edges: int  # of those, spanning > loop_gap_s (true closures)
    num_chain_edges: int  # odometry insurance edges added
    mean_correction_m: float  # camera-center shift over valid keyframes
    max_correction_m: float
    # valid keyframes sorted by timestamp (offsets from the first staged
    # frame, see VisualOdometry.time_base):
    kf_ts: np.ndarray  # [V]
    old_T_w_k: np.ndarray  # [V, 7]
    new_T_w_k: np.ndarray  # [V, 7]
    # appearance (place-recognition) loop edges for keyframe pairs without
    # co-observations - duplicated-landmark revisits:
    num_appearance_edges: int = 0
    # [E, 2, 3] post-relax world camera centers of the loop constraints
    # (co-obs pairs spanning > loop_gap_s + appearance pairs) - render with
    # MapViewer.export_html(edges=...)
    loop_pairs_w: np.ndarray = None


def _noop_report() -> RelaxReport:
    return RelaxReport(
        0, 0, 0, 0.0, 0.0,
        np.zeros((0,), np.float64),
        np.zeros((0, 7), np.float32),
        np.zeros((0, 7), np.float32),
        loop_pairs_w=np.zeros((0, 2, 3), np.float32),
    )


def relax_map(
    state,
    cfg,
    *,
    min_shared: int = 8,
    max_pair_weight: float = 30.0,
    odometry_weight: float = 30.0,
    num_iterations: int = 12,
    robust_delta: float = 0.05,
    loop_gap_s: float = 5.0,
    appearance: bool = True,
    appearance_min_inliers: int = 12,
    require_loop: bool = False,
):
    """Relax all keyframe poses against the co-observation graph and
    deform the map accordingly.  Returns ``(new_state, RelaxReport)``.

    - The temporally-first valid keyframe is the gauge (fixed), matching
      the backend's KF-0 convention (``src/backend.cpp:60-63`` fixes the
      first frame of the window).
    - Consecutive-in-time keyframe pairs without a strong co-observation
      edge get an odometry edge holding the current relative estimate, so
      the graph always stays connected.
    - ``robust_delta`` drives the redescending kernel + chi2 prune in the
      solver; wrong loop edges (aliased geometry) die there rather than
      bending the trajectory.
    - ``require_loop=True`` makes the relaxation a NO-OP unless at least
      one loop edge (co-observation spanning > ``loop_gap_s``, or
      appearance) exists.  Without loop information the graph holds only
      short-gap co-observation + odometry edges, whose Kabsch measurements
      are strictly noisier than the BA-refined poses they would replace -
      measured on a 56-frame hard-scene circuit as ATE 0.25 -> 0.36 cm per
      loopless relax.  The online (mid-run) path always sets this.
    """
    kf_valid = np.asarray(state.kf_valid)
    slots = np.nonzero(kf_valid)[0]
    if slots.size < 2:
        return state, _noop_report()

    cam = Camera.from_config(cfg)
    graph = loopclosure.build_coobservation_graph(
        state, cam, min_shared=min_shared, max_pair_weight=max_pair_weight
    )
    poses_w = se3.inverse(state.kf_pose)  # [K, 7] T_w_c

    ts = np.asarray(state.kf_timestamp).astype(np.float64)
    order = slots[np.argsort(ts[slots], kind="stable")]

    num_coobs = int(graph.edge_i.shape[0])
    loop_ij: list = []
    if num_coobs:
        gi, gj = np.asarray(graph.edge_i), np.asarray(graph.edge_j)
        is_loop = np.abs(ts[gi] - ts[gj]) > loop_gap_s
        num_loop = int(np.sum(is_loop))
        loop_ij += list(zip(gi[is_loop].tolist(), gj[is_loop].tolist()))
        have = set(zip(gi.tolist(), gj.tolist()))
    else:
        num_loop = 0
        have = set()

    # appearance edges cover revisits that duplicated landmarks (no shared
    # observation rows -> invisible to the co-observation graph)
    num_app = 0
    if appearance:
        app = loopclosure.build_appearance_graph(
            state, cam,
            loop_gap_s=loop_gap_s,
            min_inliers=appearance_min_inliers,
            max_pair_weight=max_pair_weight,
            exclude=have,
        )
        num_app = int(app.edge_i.shape[0])
        if num_app:
            ai, aj = np.asarray(app.edge_i), np.asarray(app.edge_j)
            loop_ij += list(zip(ai.tolist(), aj.tolist()))
            have |= set(zip(ai.tolist(), aj.tolist()))
            graph = (
                posegraph.concat_graphs(graph, app) if num_coobs else app
            )

    if require_loop and num_loop + num_app == 0:
        # nothing to close: leave the BA-refined poses untouched (see the
        # docstring) but still report what was detected
        rep = _noop_report()
        rep.num_edges = num_coobs
        return state, rep

    chain = []
    for a, b in zip(order[:-1], order[1:]):
        i, j = (int(a), int(b)) if a < b else (int(b), int(a))
        if (i, j) not in have:
            chain.append((i, j))
    if chain:
        ci = jnp.asarray([c[0] for c in chain], jnp.int32)
        cj = jnp.asarray([c[1] for c in chain], jnp.int32)
        chain_graph = posegraph.PoseGraph(
            edge_i=ci,
            edge_j=cj,
            edge_meas=posegraph.relative_measurement(poses_w[ci], poses_w[cj]),
            edge_weight=jnp.full((len(chain),), odometry_weight, jnp.float32),
            edge_valid=jnp.ones((len(chain),), bool),
        )
        graph = (
            posegraph.concat_graphs(graph, chain_graph)
            if (num_coobs or num_app)
            else chain_graph
        )
    if int(graph.edge_i.shape[0]) == 0:
        return state, _noop_report()

    # bucket-pad the edge list so the jitted solver compiles O(log E) times
    # over a whole run instead of once per relax - online relaxation
    # (relax_every_kf) calls this with a growing graph, and the per-call
    # recompile was the dominant mid-run stall
    graph = posegraph.pad_graph(
        graph, posegraph.edge_bucket(int(graph.edge_i.shape[0]))
    )

    fixed = ~kf_valid
    fixed[order[0]] = True  # earliest keyframe anchors the world (gauge)
    relaxed_w = posegraph.optimize_pose_graph(
        poses_w,
        graph,
        num_iterations=num_iterations,
        robust_delta=robust_delta,
        fixed=jnp.asarray(fixed),
    )
    valid_dev = jnp.asarray(kf_valid)
    relaxed_w = jnp.where(valid_dev[:, None], relaxed_w, poses_w)

    # rigid deformation: every entity moves with its anchor keyframe
    delta_w = se3.compose(relaxed_w, se3.inverse(poses_w))  # [K, 7]
    K = kf_valid.shape[0]
    anchor_m = jnp.argmax(state.obs_valid, axis=1)  # first valid obs slot
    has_obs = jnp.any(state.obs_valid, axis=1)
    anchor_kf = jnp.clip(
        jnp.take_along_axis(state.obs_kf, anchor_m[:, None], axis=1)[:, 0],
        0,
        K - 1,
    )
    mp_pos = jnp.where(
        (has_obs & state.mp_valid)[:, None],
        se3.apply(delta_w[anchor_kf], state.mp_pos),
        state.mp_pos,
    )
    # tracking reference follows the reference keyframe's correction so a
    # mid-run relaxation keeps the frontend's motion prior coherent
    ref_delta = delta_w[jnp.clip(state.ref_kf, 0, K - 1)]
    prev_pose = se3.inverse(
        se3.compose(ref_delta, se3.inverse(state.prev_pose))
    )

    new_state = state._replace(
        kf_pose=jnp.where(
            valid_dev[:, None], se3.inverse(relaxed_w), state.kf_pose
        ),
        mp_pos=mp_pos,
        prev_pose=prev_pose,
    )

    old_w = np.asarray(poses_w)
    new_w = np.asarray(relaxed_w)
    shift = np.linalg.norm(new_w[slots, 4:7] - old_w[slots, 4:7], axis=1)
    if loop_ij:
        li = np.asarray([p[0] for p in loop_ij])
        lj = np.asarray([p[1] for p in loop_ij])
        loop_pairs = np.stack([new_w[li, 4:7], new_w[lj, 4:7]], axis=1)
    else:
        loop_pairs = np.zeros((0, 2, 3), np.float32)
    report = RelaxReport(
        num_edges=num_coobs,
        num_loop_edges=num_loop,
        num_chain_edges=len(chain),
        mean_correction_m=float(shift.mean()),
        max_correction_m=float(shift.max()),
        kf_ts=ts[order],
        old_T_w_k=old_w[order],
        new_T_w_k=new_w[order],
        num_appearance_edges=num_app,
        loop_pairs_w=loop_pairs,
    )
    return new_state, report


def correct_trajectory(
    report: RelaxReport,
    frame_ts: np.ndarray,
    poses_w_c: np.ndarray,
) -> np.ndarray:
    """Apply a relaxation to a per-frame trajectory: each frame moves
    rigidly with its reference keyframe (the most recent keyframe at or
    before it; frames before the first keyframe use the first).

    ``frame_ts`` are offsets from the first staged frame (the same clock
    as ``RelaxReport.kf_ts``); ``poses_w_c`` are ``[N, 7]`` T_w_c rows.
    """
    if report.kf_ts.size == 0:
        return np.asarray(poses_w_c)
    idx = np.searchsorted(report.kf_ts, np.asarray(frame_ts) + 1e-6) - 1
    idx = np.clip(idx, 0, report.kf_ts.size - 1)
    old_w = jnp.asarray(report.old_T_w_k[idx])
    new_w = jnp.asarray(report.new_T_w_k[idx])
    delta = se3.compose(new_w, se3.inverse(old_w))
    return np.asarray(
        se3.compose(delta, jnp.asarray(poses_w_c, jnp.float32))
    )
