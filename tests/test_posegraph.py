"""Pose-graph optimizer tests: fixed point, gauge, loop-closure drift
removal, redescending-kernel robustness to a bad loop edge."""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_visualodometry_tpu.ops import posegraph, se3


def _circle(k=40, radius=1.0, step=0.15):
    """Ground-truth circular trajectory of T_w_c poses."""
    ang = step * np.arange(k)
    q = np.stack(
        [np.cos(ang / 2), np.zeros(k), np.zeros(k), np.sin(ang / 2)], axis=-1
    )
    t = np.stack(
        [radius * np.cos(ang), radius * np.sin(ang), np.zeros(k)], axis=-1
    )
    return jnp.asarray(np.concatenate([q, t], axis=-1), jnp.float32)


def _integrate(start, meas):
    """Chain relative measurements into absolute poses."""
    poses = [start]
    for m in meas:
        poses.append(se3.compose(poses[-1], m))
    return jnp.stack(poses)


def _drifted_problem(seed=0, k=40, noise=0.01):
    """Noisy odometry integrated into drifted poses + a clean loop edge."""
    gt = _circle(k)
    rng = np.random.default_rng(seed)
    meas = posegraph.relative_measurement(gt[:-1], gt[1:])
    xi = jnp.asarray(rng.normal(0, noise, (k - 1, 6)), jnp.float32)
    meas_noisy = se3.compose(se3.exp(xi), meas)
    init = _integrate(gt[0], list(meas_noisy))
    odom = posegraph.PoseGraph(
        edge_i=jnp.arange(k - 1, dtype=jnp.int32),
        edge_j=jnp.arange(1, k, dtype=jnp.int32),
        edge_meas=meas_noisy,
        edge_weight=jnp.ones(k - 1, jnp.float32),
        edge_valid=jnp.ones(k - 1, bool),
    )
    loop = posegraph.PoseGraph(
        edge_i=jnp.asarray([0], jnp.int32),
        edge_j=jnp.asarray([k - 1], jnp.int32),
        edge_meas=posegraph.relative_measurement(gt[0], gt[k - 1])[None],
        # bounded information: a loop whose weight dwarfs the whole odometry
        # chain can capture IRLS (see ops/posegraph.py docstring)
        edge_weight=jnp.asarray([10.0], jnp.float32),
        edge_valid=jnp.asarray([True]),
    )
    return gt, init, posegraph.concat_graphs(odom, loop)


def _pos_rmse(a, b):
    return float(jnp.sqrt(jnp.mean(jnp.sum((a[:, 4:7] - b[:, 4:7]) ** 2, -1))))


def test_perfect_graph_is_fixed_point():
    gt = _circle()
    graph = posegraph.odometry_edges(gt)
    out = posegraph.optimize_pose_graph(gt, graph, num_iterations=3)
    r = posegraph.residuals(out, graph)
    assert float(jnp.abs(r).max()) < 1e-5
    assert _pos_rmse(out, gt) < 1e-5


def test_loop_closure_removes_drift():
    gt, init, graph = _drifted_problem()
    drift0 = _pos_rmse(init, gt)
    assert drift0 > 0.02  # the problem is actually drifted
    out = posegraph.optimize_pose_graph(init, graph, num_iterations=10)
    drift1 = _pos_rmse(out, gt)
    assert drift1 < drift0 / 2.5, (drift0, drift1)
    # the loop edge is satisfied afterwards
    r = posegraph.residuals(out, graph)
    assert float(jnp.linalg.norm(r[-1])) < 0.01


def test_gauge_pose_stays_fixed():
    gt, init, graph = _drifted_problem(seed=1)
    out = posegraph.optimize_pose_graph(init, graph, num_iterations=5)
    assert float(jnp.abs(out[0] - init[0]).max()) < 1e-6


def test_masked_edges_are_ignored():
    gt = _circle(10)
    graph = posegraph.odometry_edges(gt)
    # corrupt one measurement but mask it out
    bad = graph.edge_meas.at[3].set(se3.exp(jnp.ones(6, jnp.float32)))
    graph = graph._replace(
        edge_meas=bad, edge_valid=graph.edge_valid.at[3].set(False)
    )
    out = posegraph.optimize_pose_graph(gt, graph, num_iterations=3)
    assert _pos_rmse(out, gt) < 1e-5


def test_robust_kernel_rejects_outlier_loop_edge():
    gt, init, graph = _drifted_problem(seed=2)
    # add a WRONG high-weight loop edge
    bogus = posegraph.PoseGraph(
        edge_i=jnp.asarray([5], jnp.int32),
        edge_j=jnp.asarray([30], jnp.int32),
        edge_meas=se3.exp(jnp.asarray([1.0, -1, 0.5, 0.3, -0.2, 0.4]))[None],
        edge_weight=jnp.asarray([10.0], jnp.float32),
        edge_valid=jnp.asarray([True]),
    )
    g2 = posegraph.concat_graphs(graph, bogus)
    robust = posegraph.optimize_pose_graph(
        init, g2, num_iterations=10, robust_delta=0.05
    )
    naive = posegraph.optimize_pose_graph(init, g2, num_iterations=10)
    assert _pos_rmse(robust, gt) < _pos_rmse(naive, gt) / 5
    assert _pos_rmse(robust, gt) < 0.05
    # the wrong edge is pruned (large residual), the true loop is satisfied
    r = posegraph.residuals(robust, g2)
    assert float(jnp.linalg.norm(r[-1])) > 1.0
    assert float(jnp.linalg.norm(r[-2])) < 0.01


def test_residuals_shape_and_mask():
    gt = _circle(8)
    graph = posegraph.odometry_edges(gt)
    graph = graph._replace(edge_valid=graph.edge_valid.at[0].set(False))
    r = posegraph.residuals(gt, graph)
    assert r.shape == (7, 6)
    assert float(jnp.abs(r[0]).max()) == 0.0
