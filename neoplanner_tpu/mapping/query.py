"""Backend-generic map queries: grid ESDF or analytic scene SDF.

The closed loop queries obstacle distance in three places (planning costs,
the 10 Hz closed-loop metric, local-target escape). Each accepts either map
backend — the rasterized ESDFMap (reference parity / sensed maps,
map_server/esdf.py:53-82) or the analytic SceneMap (simulation fast path,
mapping/scene.py). Dispatching here lets the env state in the gt+scene mode
drop the per-env (H, W) grids entirely — the round-1 B=4096 scaling collapse
was 1 MB/env of grids in HBM (BASELINE.md round-2 notes).
"""

from __future__ import annotations

import jax.numpy as jnp

from neoplanner_tpu.mapping import esdf as esdf_map
from neoplanner_tpu.mapping import scene as scene_map


def distance(map_obj, pos: jnp.ndarray, interp: str = "nearest"):
    """(dis, grad) at (..., 2) world points from either backend."""
    if isinstance(map_obj, scene_map.SceneMap):
        return scene_map.sample(map_obj, pos)
    return esdf_map.sample(map_obj, pos, mode=interp)


def has_collision(map_obj, pos: jnp.ndarray, safe_dis) -> jnp.ndarray:
    """Point-in-collision predicate (esdf.py:50-51 semantics) on either backend."""
    dis, _ = distance(map_obj, pos)
    return dis < safe_dis
