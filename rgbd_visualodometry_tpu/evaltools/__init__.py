"""Offline evaluation: ATE (Horn alignment), RPE, trajectory tooling.

Fresh implementations of the metric definitions used by the reference's
``tools/evaluate_ate.py`` and ``tools/evaluate_rpe.py`` (themselves the
standard TUM benchmark tools) - these are the acceptance gates for the
framework (SURVEY.md section 6)."""

from rgbd_visualodometry_tpu.evaltools.ate import absolute_trajectory_error, horn_align
from rgbd_visualodometry_tpu.evaltools.rpe import relative_pose_error

__all__ = ["absolute_trajectory_error", "horn_align", "relative_pose_error"]
