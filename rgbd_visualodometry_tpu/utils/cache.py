"""Persistent XLA compilation cache.

The fused tracking+BA program at full fr1 capacity takes minutes to compile
on TPU; the persistent cache makes every process after the first start in
seconds.  Enabled automatically when a :class:`VisualOdometry` system is
constructed (idempotent)."""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = path or os.environ.get(
        "RGBD_VO_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/rgbd_vo_xla_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:  # cache is an optimization, never a requirement
        pass
