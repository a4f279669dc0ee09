"""Map-state checkpoint / resume.

The reference has NO persistence - its only artifact is the streamed
trajectory file (``app/run_vo.cpp:67-70,116``); the map dies with the
process (SURVEY.md section 5).  Because this framework's whole world state
is one pytree of arrays, checkpointing is trivial and exact: every leaf is
serialized to a compressed ``.npz`` along with the config, and a resumed
session continues bit-identically (the RNG key is part of the state).
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np

from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.mapstate import VOState


def save_state(state: VOState, cfg: VOConfig, path: str, meta: dict | None = None) -> None:
    """Serialize the full VO state + config to ``path`` (.npz).

    ``meta`` holds small host-side session values that are not device state,
    e.g. ``time_base`` (the absolute float64 time origin - device timestamps
    are offsets; see ``VisualOdometry.time_base``).
    """
    leaves = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(jax.tree_util.tree_leaves(state))}
    leaves["__config__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8
    )
    leaves["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **leaves)


def load_state(path: str, with_meta: bool = False):
    """Restore ``(state, config)`` - or ``(state, config, meta)`` when
    ``with_meta`` - saved by :func:`save_state`."""
    data = np.load(path)
    cfg = VOConfig.from_dict(json.loads(bytes(data["__config__"]).decode()))

    from rgbd_visualodometry_tpu import mapstate

    template = mapstate.init_state(cfg)
    treedef = jax.tree_util.tree_structure(template)
    n = len(jax.tree_util.tree_leaves(template))
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    # restore leaf dtypes exactly (npz keeps them; device_put on use)
    if with_meta:
        meta = (
            json.loads(bytes(data["__meta__"]).decode())
            if "__meta__" in data
            else {}
        )
        return state, cfg, meta
    return state, cfg
