"""Device-resident 2-D log-odds occupancy mapping from depth images.

Replaces octomap_server (the external C++ node the reference feeds with
`/iris/camera/depth/points` to get the `projected_map` OccupancyGrid,
map_server_onboard.launch:9-32). Log-odds parameters are octomap's defaults
(hit 0.7 / miss 0.4, clamping [0.12, 0.97] — plugin_build_octomap.cpp:271-275).

Design: instead of octomap's per-ray tree insertion, each depth frame becomes two
fused scatter passes over a dense (H, W) grid —

  1. *hits*: back-projected endpoints inside the occupancy slice z∈[z_min, z_max]
     scatter +l_hit into their cells;
  2. *misses*: fixed-count samples along every (optionally strided) ray before its
     endpoint scatter +l_miss, z-filtered by the same slice (this reproduces
     octomap's 3-D carving projected to 2-D for the tall-obstacle worlds at hand).

Everything is jnp scatter-adds with static shapes; vmap over envs batches mapping
across thousands of drones.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from neoplanner_tpu.config import CameraParams, MapParams
from neoplanner_tpu.sense import raycast


def logodds_init(mp: MapParams) -> jnp.ndarray:
    return jnp.zeros((mp.height, mp.width))


def _l(p: float) -> float:
    return math.log(p / (1.0 - p))


def _cell_idx(x, y, mp: MapParams):
    col = jnp.floor((x - mp.origin_x) / mp.resolution).astype(jnp.int32)
    row = jnp.floor((y - mp.origin_y) / mp.resolution).astype(jnp.int32)
    inb = (row >= 0) & (row < mp.height) & (col >= 0) & (col < mp.width)
    return row, col, inb


def insert_depth(logodds: jnp.ndarray, depth: jnp.ndarray, pos: jnp.ndarray,
                 quat: jnp.ndarray, cam: CameraParams, mp: MapParams,
                 carve_stride: int = 2, carve_samples: int = 48) -> jnp.ndarray:
    """Fuse one depth frame into the log-odds grid. Returns the updated grid."""
    l_hit = _l(mp.prob_hit)
    l_miss = _l(mp.prob_miss)
    l_min = _l(mp.clamp_min)
    l_max = _l(mp.clamp_max)

    pts, hit = raycast.depth_to_points(depth, pos, quat, cam)

    # --- hits
    in_slice = (pts[..., 2] >= mp.z_min) & (pts[..., 2] <= mp.z_max)
    row, col, inb = _cell_idx(pts[..., 0], pts[..., 1], mp)
    w_hit = (hit & in_slice & inb).astype(logodds.dtype) * l_hit
    logodds = logodds.at[jnp.clip(row, 0, mp.height - 1),
                         jnp.clip(col, 0, mp.width - 1)].add(w_hit)

    # --- free-space carving along strided rays
    pts_s = pts[::carve_stride, ::carve_stride]
    hit_s = hit[::carve_stride, ::carve_stride]
    ray = pts_s - pos                                     # endpoint vectors
    length = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    # sample fractions stop one cell short of the endpoint so hits survive
    fr = (jnp.arange(carve_samples) + 0.5) / carve_samples
    margin = jnp.maximum(length - mp.resolution, 0.0)
    samples = pos + ray / jnp.maximum(length, 1e-6) * (fr[:, None, None, None]
                                                      * margin[None])
    z_ok = (samples[..., 2] >= mp.z_min) & (samples[..., 2] <= mp.z_max)
    srow, scol, sinb = _cell_idx(samples[..., 0], samples[..., 1], mp)
    w_miss = (z_ok & sinb).astype(logodds.dtype) * l_miss
    del hit_s  # carving applies to both hit and max-range rays, as in octomap
    logodds = logodds.at[jnp.clip(srow, 0, mp.height - 1),
                         jnp.clip(scol, 0, mp.width - 1)].add(w_miss)

    return jnp.clip(logodds, l_min, l_max)


def to_occupancy(logodds: jnp.ndarray, mp: MapParams) -> jnp.ndarray:
    """Binarized occupancy (the reference binarizes projected_map at p=100,
    treating unknown as free — esdf.py:23). Unknown (log-odds 0) -> free."""
    threshold = _l(mp.occ_threshold)
    return (logodds > threshold + 1e-6).astype(jnp.float32)
