"""Shared utilities: compilation cache, timing, logging."""

from rgbd_visualodometry_tpu.utils.cache import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
