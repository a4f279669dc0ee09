"""Host-side map/trajectory viewer.

Functional replacement for the reference ``Viewer`` (``src/viewer.cpp``):
the Pangolin thread there draws (a) the current camera frustum, (b) all
mappoints as a colored point cloud (``viewer.cpp:68-86``), and (c) a
cv::imshow overlay of the current frame with matched keypoints highlighted
(``viewer.cpp:144-150``).  Here the same three views are rendered on the
host with matplotlib / numpy - a deliberate design change: the TPU hot loop
must never block on rendering, so visualization consumes host-side
snapshots (``VisualOdometry.map_snapshot``) instead of sharing mutex-guarded
map objects.
"""

from __future__ import annotations

import numpy as np


class MapViewer:
    """Renders map snapshots to PNG files (headless-friendly)."""

    def __init__(self, out_dir: str = "viewer_out"):
        import os

        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self._counter = 0

    def render_map(self, snapshot: dict, trajectory: np.ndarray | None = None, name: str | None = None) -> str:
        """Top-down + 3D view of mappoints, keyframes and trajectory.

        snapshot: output of ``VisualOdometry.map_snapshot()``;
        trajectory: optional [N, 3] camera positions (T_w_c translations).
        Returns the written file path.
        """
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pts = snapshot["mappoints"]
        kf = snapshot["keyframe_poses"]
        fig = plt.figure(figsize=(12, 6))
        ax = fig.add_subplot(121)
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 1], s=1, c=pts[:, 2], cmap="viridis")
        if trajectory is not None and len(trajectory):
            ax.plot(trajectory[:, 0], trajectory[:, 1], "r-", lw=1.5, label="trajectory")
            # current-camera frustum in red (the DrawFrame analogue,
            # viewer.cpp:89-136), drawn for the last pose
            self._draw_frustum_2d(ax, trajectory[-1], kf)
            ax.legend()
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        ax.set_title(f"map: {len(pts)} points, {snapshot['num_keyframes']} keyframes")
        ax.set_aspect("equal", adjustable="datalim")

        ax3 = fig.add_subplot(122, projection="3d")
        if len(pts):
            sub = pts[:: max(len(pts) // 5000, 1)]
            ax3.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=1, c=sub[:, 2], cmap="viridis")
        if trajectory is not None and len(trajectory):
            ax3.plot(trajectory[:, 0], trajectory[:, 1], trajectory[:, 2], "r-", lw=1.5)
        ax3.set_title("3D view")

        name = name or f"map_{self._counter:05d}.png"
        self._counter += 1
        path = f"{self.out_dir}/{name}"
        fig.tight_layout()
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path

    @staticmethod
    def _draw_frustum_2d(ax, cam_pos, kf_poses):
        """Project a simple frustum wedge for the current camera into the
        top-down view (direction from the latest keyframe orientation)."""
        import numpy as np

        if kf_poses is None or not len(kf_poses):
            return
        q = kf_poses[-1][:4]  # T_c_w of latest keyframe
        w, x, y, z = q
        # camera forward (+z of camera) in world = third row of R_c_w^T
        fwd = np.array(
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]
        )
        side = np.array([fwd[1], -fwd[0], 0.0])
        n = np.linalg.norm(side)
        side = side / n if n > 1e-6 else np.array([1.0, 0, 0])
        tip = np.asarray(cam_pos[:3])
        a = tip + 0.25 * fwd[:3] + 0.12 * side
        b = tip + 0.25 * fwd[:3] - 0.12 * side
        ax.plot(
            [a[0], tip[0], b[0]], [a[1], tip[1], b[1]], "r-", lw=1.0,
            label="camera",
        )

    def render_overlay(
        self,
        rgb: np.ndarray,
        xy: np.ndarray,
        valid: np.ndarray | None = None,
        name: str | None = None,
    ) -> str:
        """Write the per-frame keypoint-overlay image (the live
        ``cv::imshow`` of ``viewer.cpp:44-46`` as a PNG stream)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.image as mpimg

        img = self.draw_keypoints(rgb, xy, valid)
        name = name or f"frame_{self._counter:05d}.png"
        self._counter += 1
        path = f"{self.out_dir}/{name}"
        mpimg.imsave(path, img)
        return path

    @staticmethod
    def draw_keypoints(rgb: np.ndarray, xy: np.ndarray, valid: np.ndarray | None = None, radius: int = 2) -> np.ndarray:
        """Feature-overlay image (the ``PlotFrameImage`` analogue,
        ``viewer.cpp:144-150``): returns a copy of ``rgb`` with green boxes
        at keypoint locations."""
        img = np.asarray(rgb).copy()
        h, w = img.shape[:2]
        pts = np.asarray(xy)
        if valid is not None:
            pts = pts[np.asarray(valid)]
        for x, y in pts:
            xi, yi = int(round(float(x))), int(round(float(y)))
            x0, x1 = max(xi - radius, 0), min(xi + radius + 1, w)
            y0, y1 = max(yi - radius, 0), min(yi + radius + 1, h)
            img[y0:y1, x0] = (0, 255, 0)
            img[y0:y1, x1 - 1] = (0, 255, 0)
            img[y0, x0:x1] = (0, 255, 0)
            img[y1 - 1, x0:x1] = (0, 255, 0)
        return img
