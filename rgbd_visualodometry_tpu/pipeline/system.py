"""Host-side system orchestrator.

Equivalent of the object wiring and main loop in ``app/run_vo.cpp:72-128``
(Camera + FrontEnd + optional Backend + optional Viewer), minus the threads:
the tracking step and the BA step are two jitted programs on the same device
queue.  Dispatch is asynchronous - the host enqueues the BA right after a
keyframe step and immediately continues with the next frame's host work
(image decode, H2D transfer), which is the functional analogue of the
reference's backend worker thread + condvar ("latest keyframe wins",
``backend.h:33-37``).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu import mapstate
from rgbd_visualodometry_tpu.camera import Camera
from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.mapstate import LOST
from rgbd_visualodometry_tpu.pipeline import backend as backend_mod
from rgbd_visualodometry_tpu.pipeline import frontend as frontend_mod


@dataclass
class FrameResult:
    """Host-friendly per-frame record (stats mirror the reference's logs)."""

    timestamp: float
    tracked: bool
    fsm: int
    is_keyframe: bool
    pose_w_c: np.ndarray  # [7] (qw qx qy qz tx ty tz)
    pose_c_w: np.ndarray
    stats: dict[str, int] = field(default_factory=dict)
    step_seconds: float = 0.0


class VisualOdometry:
    """The user-facing system object (the FrontEnd+Backend pair of the
    reference, with the map state owned functionally instead of globally).

    Usage::

        vo = VisualOdometry(cfg)
        for rgb, depth, t in frames:
            res = vo.process(rgb, depth, t)
            if res.fsm == LOST: break
    """

    def __init__(self, cfg: VOConfig, seed: int = 0, device: Optional[Any] = None):
        self.cfg = cfg
        self.camera = Camera.from_config(cfg)
        self.device = device or jax.devices()[0]
        self.state = jax.device_put(mapstate.init_state(cfg, seed), self.device)
        self._step = jax.jit(
            functools.partial(frontend_mod.track_step, cfg, self.camera),
            donate_argnums=0,
        )
        self._ba = jax.jit(
            functools.partial(backend_mod.ba_step, cfg, self.camera),
            donate_argnums=0,
        )
        self.results: list[FrameResult] = []
        self.enable_backend = bool(cfg.enable_local_optimization)

    def process(self, rgb: np.ndarray, depth: np.ndarray, timestamp: float) -> FrameResult:
        """Track one frame (the ``frontend->AddFrame`` hot path,
        ``run_vo.cpp:104-109``)."""
        t0 = time.perf_counter()
        frame = frontend_mod.FrameInput(
            rgb=jnp.asarray(rgb, jnp.uint8),
            depth=jnp.asarray(depth, jnp.uint16),
            timestamp=jnp.float32(timestamp),
        )
        self.state, out = self._step(self.state, frame)
        # async BA dispatch: enqueue and return without blocking; XLA's
        # in-order device queue serializes it behind the tracking step
        if self.enable_backend and bool(out.needs_ba):
            self.state, _ = self._ba(self.state, out.kf_slot)
        pose_w_c = np.asarray(out.pose_w_c)
        res = FrameResult(
            timestamp=float(timestamp),
            tracked=bool(out.tracked),
            fsm=int(out.fsm),
            is_keyframe=bool(out.is_keyframe),
            pose_w_c=pose_w_c,
            pose_c_w=np.asarray(out.pose_c_w),
            stats=dict(
                num_candidates=int(out.num_candidates),
                num_matches=int(out.num_matches),
                num_inliers=int(out.num_inliers),
                num_final_inliers=int(out.num_final_inliers),
                num_new_mappoints=int(out.num_new_mappoints),
                num_triangulated=int(out.num_triangulated),
                num_keyframes=int(out.num_keyframes),
                num_mappoints=int(out.num_mappoints),
            ),
            step_seconds=time.perf_counter() - t0,
        )
        self.results.append(res)
        return res

    @property
    def lost(self) -> bool:
        return bool(self.results) and self.results[-1].fsm == LOST

    def run(self, frames, trajectory_path: Optional[str] = None, verbose: bool = False):
        """Dataset loop mirroring ``run_vo.cpp:89-117``: track every frame,
        stream TUM-format poses of tracked frames, stop on LOST."""
        from rgbd_visualodometry_tpu.io.trajectory import TrajectoryWriter

        writer = TrajectoryWriter(trajectory_path) if trajectory_path else None
        try:
            for rgb, depth, ts in frames:
                res = self.process(rgb, depth, ts)
                if verbose:
                    s = res.stats
                    print(
                        f"t={res.timestamp:.3f} fsm={res.fsm} kf={int(res.is_keyframe)} "
                        f"match={s['num_matches']} inlier={s['num_inliers']} "
                        f"map={s['num_mappoints']} {res.step_seconds * 1e3:.1f} ms"
                    )
                if res.fsm == LOST:
                    break
                if writer and res.tracked:
                    writer.write(res.timestamp, res.pose_w_c)
        finally:
            if writer:
                writer.close()
        return self.results

    def map_snapshot(self) -> dict[str, np.ndarray]:
        """Host copy of the live map (for the viewer / checkpointing)."""
        s = self.state
        alive = np.asarray(s.mp_alive)
        return dict(
            mappoints=np.asarray(s.mp_pos)[alive],
            keyframe_poses=np.asarray(s.kf_pose)[np.asarray(s.kf_valid)],
            num_keyframes=int(s.num_kf),
        )
