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


BIG = 1e9


def polar_columns(depth: jnp.ndarray, pos: jnp.ndarray, quat: jnp.ndarray,
                  cam: CameraParams, mp: MapParams, row_stride: int = 1):
    """Collapse a depth frame to the projected plane, per image column:

      r_hit(u)   — nearest in-slice hit range (the visible obstacle surface)
      r_carve(u) — how far the column's rays traverse the z-slice before the
                   nearest obstacle (slab-clipped against [z_min, z_max])
      u_dir(u)   — the column's horizontal world direction (mid-row azimuth)

    Shared by both 2-D fusion backends (scatter and dense). ``row_stride``
    must match the stride the depth frame was rendered with (the column
    reductions then run over the coarse row subset)."""
    from neoplanner_tpu.core import frames

    dirs_body = raycast.ray_dirs_camera(cam, row_stride)   # (H, W, 3), unit
    # Never materialize the rotated (H, W, 3) world-dirs tensor: under the
    # batched fusion vmaps its cross-product chain is the HBM high-water mark
    # (5.6 GB padded world points + 6x 1.9 GB cross temps at B=8192, F=5 —
    # the measured vision batch ceiling, BASELINE.md round 5). Only the world
    # z-component is needed per pixel: dz = R(q)[2, :] . d_body, and R's
    # third row is the inverse-rotated world z axis — 3 scalars per frame.
    # The rays are unit, so the horizontal magnitude is sqrt(1 - dz^2).
    zrow = frames.quat_rotate_inv(quat, jnp.array([0.0, 0.0, 1.0]))  # (3,)
    t_end = depth / jnp.maximum(dirs_body[..., 0], 1e-6)   # ray length
    dz = dirs_body @ zrow                                   # (H, W)
    hnorm = jnp.sqrt(jnp.maximum(1.0 - dz * dz, 0.0))

    # slab-clip each ray against the occupancy slice z in [z_min, z_max]
    dz_safe = jnp.where(jnp.abs(dz) < 1e-6, 1e-6, dz)
    tz1 = (mp.z_min - pos[2]) / dz_safe
    tz2 = (mp.z_max - pos[2]) / dz_safe
    t_lo = jnp.minimum(tz1, tz2)
    t_hi = jnp.maximum(tz1, tz2)
    level = jnp.abs(dz) < 1e-6
    inside = (pos[2] >= mp.z_min) & (pos[2] <= mp.z_max)
    t_hi = jnp.where(level, jnp.where(inside, BIG, -1.0), t_hi)
    t_lo = jnp.where(level, 0.0, t_lo)
    # rays that enter the slice right away can carve (camera inside the slice)
    can_carve = t_lo <= 1e-3

    hit = depth < cam.max_range - 1e-4
    end_z = pos[2] + t_end * dz
    end_in_slice = (end_z >= mp.z_min) & (end_z <= mp.z_max)

    r_end = t_end * hnorm                                   # horizontal range
    r_hit_px = jnp.where(hit & end_in_slice, r_end, BIG)
    r_hit_col = jnp.min(r_hit_px, axis=0)                   # (W,)

    r_free_px = jnp.where(can_carve, jnp.minimum(t_end, t_hi) * hnorm, 0.0)
    r_carve_col = jnp.minimum(jnp.max(r_free_px, axis=0), r_hit_col)  # (W,)

    mid_body = dirs_body[dirs_body.shape[0] // 2]           # (W, 3)
    mid = frames.quat_rotate(quat[None, :], mid_body)[:, :2]
    u_dir = mid / jnp.maximum(jnp.linalg.norm(mid, axis=-1, keepdims=True),
                              1e-9)
    return r_hit_col, r_carve_col, u_dir


def insert_depth_2d(logodds: jnp.ndarray, depth: jnp.ndarray,
                    pos: jnp.ndarray, quat: jnp.ndarray, cam: CameraParams,
                    mp: MapParams, carve_samples: int = 48,
                    row_stride: int = 1) -> jnp.ndarray:
    """Projected-plane depth fusion: one polar ray per image column.

    The 3-D strided carving of :func:`insert_depth` costs (H/2 x W/2) rays x
    48 samples of scatter-adds per frame — ~118M serialized scatter updates
    per 512-env frame batch, the measured bottleneck of the whole vision loop
    (BASELINE.md round 2). Since the planner only ever consumes the *projected*
    2-D occupancy (the reference's `projected_map`, binarized at esdf.py:23),
    fusion can run directly in that plane: every image column collapses to

      r_hit(u)   — nearest in-slice hit range (the visible obstacle surface),
      r_carve(u) — how far the column's rays traverse the z-slice before the
                   nearest obstacle (slab-clipped against [z_min, z_max]),

    and the update becomes W polar rays x carve_samples cells: ~30x fewer
    scatters for the same projected map. Differences vs the 3-D version, both
    harmless to the loop: cells behind obstacles that tall-passing rays would
    carve stay unknown (unknown binarizes to free anyway), and only the
    nearest hit per column marks occupancy (the visible surface). Column
    azimuth is taken at the middle row — exact for level flight, cm-level at
    this controller's tilt envelope.
    """
    l_hit = _l(mp.prob_hit)
    l_miss = _l(mp.prob_miss)
    l_min = _l(mp.clamp_min)
    l_max = _l(mp.clamp_max)
    r_hit_col, r_carve_col, u_dir = polar_columns(depth, pos, quat, cam, mp,
                                                  row_stride)

    # carve: W polar rays, fixed sample count, stop one cell short
    fr = (jnp.arange(carve_samples) + 0.5) / carve_samples
    r_s = fr[:, None] * jnp.maximum(r_carve_col - mp.resolution, 0.0)[None, :]
    cx = pos[0] + r_s * u_dir[None, :, 0]
    cy = pos[1] + r_s * u_dir[None, :, 1]
    row, col, inb = _cell_idx(cx, cy, mp)
    w_miss = (inb & (r_s > 0)).astype(logodds.dtype) * l_miss
    logodds = logodds.at[jnp.clip(row, 0, mp.height - 1),
                         jnp.clip(col, 0, mp.width - 1)].add(w_miss)

    # hits: the nearest in-slice hit per column
    hx = pos[0] + r_hit_col * u_dir[:, 0]
    hy = pos[1] + r_hit_col * u_dir[:, 1]
    hrow, hcol, hinb = _cell_idx(hx, hy, mp)
    w_hit = (hinb & (r_hit_col < BIG)).astype(logodds.dtype) * l_hit
    logodds = logodds.at[jnp.clip(hrow, 0, mp.height - 1),
                         jnp.clip(hcol, 0, mp.width - 1)].add(w_hit)

    return jnp.clip(logodds, l_min, l_max)


def to_occupancy(logodds: jnp.ndarray, mp: MapParams) -> jnp.ndarray:
    """Binarized occupancy (the reference binarizes projected_map at p=100,
    treating unknown as free — esdf.py:23). Unknown (log-odds 0) -> free."""
    threshold = _l(mp.occ_threshold)
    return (logodds > threshold + 1e-6).astype(jnp.float32)
