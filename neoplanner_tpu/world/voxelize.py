"""Obstacle scene -> occupancy grids (2-D slice and 3-D voxel volume) + analytic SDF.

TPU-native replacement for the reference's BuildOctomapPlugin ray rasterizer
(/root/reference/src/sim_gazebo_plugins/src/plugin_build_octomap.cpp:255-363) and the
octomap_server 2-D projection (map_server_onboard.launch:30-32): since the scene is
an array of primitives (axis-aligned boxes + vertical cylinders), rasterization is
an exact analytic point-membership test over cell centers — no rays, one fused
elementwise pass on the VPU. fill_unknown_3d reproduces the plugin's
unknown-space pass (flood-fill free, unreached voxels become occupied) for
scenes with enclosed cavities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neoplanner_tpu.config import MapParams
from neoplanner_tpu.core.types import SHAPE_CYLINDER, BoxWorld


def _cell_centers_2d(mp: MapParams):
    xs = mp.origin_x + (jnp.arange(mp.width) + 0.5) * mp.resolution
    ys = mp.origin_y + (jnp.arange(mp.height) + 0.5) * mp.resolution
    return xs, ys


def _footprint_hit(world: BoxWorld, xs: jnp.ndarray, ys: jnp.ndarray):
    """(K, H, W) bool: cell center inside each primitive's xy footprint."""
    cx = world.centers[:, 0][:, None, None]
    cy = world.centers[:, 1][:, None, None]
    hx = world.half_sizes[:, 0][:, None, None]
    hy = world.half_sizes[:, 1][:, None, None]
    dx = xs[None, None, :] - cx
    dy = ys[None, :, None] - cy
    box_hit = (jnp.abs(dx) <= hx) & (jnp.abs(dy) <= hy)
    cyl_hit = dx * dx + dy * dy <= hx * hx       # radius = half_sizes[:, 0]
    is_cyl = (world.shape == SHAPE_CYLINDER)[:, None, None]
    return jnp.where(is_cyl, cyl_hit, box_hit)


def occupancy_2d(world: BoxWorld, mp: MapParams) -> jnp.ndarray:
    """(H, W) {0,1}: cell center inside any active footprint whose z-extent
    intersects the slice [z_min, z_max] (the octomap_server projection semantics)."""
    xs, ys = _cell_centers_2d(mp)
    z_lo = world.centers[:, 2] - world.half_sizes[:, 2]
    z_hi = world.centers[:, 2] + world.half_sizes[:, 2]
    in_slice = (z_hi > mp.z_min) & (z_lo < mp.z_max) & world.active
    hit = _footprint_hit(world, xs, ys) & in_slice[:, None, None]
    return jnp.any(hit, axis=0).astype(jnp.float32)


def occupancy_3d(world: BoxWorld, mp: MapParams, z_cells: int,
                 z_origin: float = 0.0) -> jnp.ndarray:
    """(Z, H, W) voxel volume — the .bt/.pcd ground-truth map equivalent."""
    xs, ys = _cell_centers_2d(mp)
    zs = z_origin + (jnp.arange(z_cells) + 0.5) * mp.resolution
    in_z = (jnp.abs(zs[None, :] - world.centers[:, 2:3])
            <= world.half_sizes[:, 2:3])                       # (K, Z)
    fp = _footprint_hit(world, xs, ys)                         # (K, H, W)
    hit = (in_z[:, :, None, None] & fp[:, None, :, :]
           & world.active[:, None, None, None])
    return jnp.any(hit, axis=0).astype(jnp.float32)


def fill_unknown_3d(occ: jnp.ndarray,
                    seeds: tuple = None) -> jnp.ndarray:
    """Reference octomap unknown-space semantics for a (Z, H, W) volume:
    flood-fill free space 6-connected from seed voxels, then mark every
    voxel the fill never reached as occupied
    (plugin_build_octomap.cpp:317-357 — FloodFill from the two z-extreme
    seeds at the bounding-box center column, then "set unknown to filled").

    The analytic rasterizer (occupancy_3d) is exact for primitive scenes, so
    this only changes the result when the scene encloses cavities (e.g. the
    hollow interior of a mesh-walled room): the reference marks those
    occupied, and with this pass so do we. Implemented as an XLA fixpoint
    dilation (one 6-neighbor max per step, lax.while_loop until no change)
    — an offline map-building utility, not a hot path.
    """
    occ_b = occ > 0.5
    Z, H, W = occ_b.shape
    if seeds is None:
        # the reference seeds: bounding-box center column (origin + leaf/2),
        # top and bottom z layers
        seeds = ((Z - 1, H // 2, W // 2), (0, H // 2, W // 2))
    free0 = jnp.zeros_like(occ_b)
    for z, r, c in seeds:
        free0 = free0.at[z, r, c].set(True)
    free0 = free0 & ~occ_b

    def dilate(free):
        grown = free
        for axis in range(3):
            lo = jnp.pad(free, [(1, 0) if a == axis else (0, 0)
                                for a in range(3)])
            hi = jnp.pad(free, [(0, 1) if a == axis else (0, 0)
                                for a in range(3)])
            take = [slice(0, s) for s in free.shape]
            drop = [slice(1, None) if a == axis else slice(None)
                    for a in range(3)]
            grown = grown | lo[tuple(take)] | hi[tuple(drop)]
        return grown & ~occ_b

    def cond(carry):
        return carry[1]

    def body(carry):
        free, _ = carry
        nxt = dilate(free)
        return nxt, jnp.any(nxt != free)

    free, _ = jax.lax.while_loop(cond, body, (free0, jnp.any(free0)))
    return (occ_b | ~free).astype(jnp.float32)


def sdf(world: BoxWorld, points: jnp.ndarray) -> jnp.ndarray:
    """Exact signed distance from (..., 3) points to the union of primitives.

    Negative inside. The analytic alternative to ESDF-grid queries for ground-truth
    collision checking (and the basis of sphere-tracing renderers).
    """
    p = points[..., None, :]                                   # (..., 1, 3)
    # box SDF
    q = jnp.abs(p - world.centers) - world.half_sizes
    box_out = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    box_in = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    d_box = box_out + box_in                                   # (..., K)
    # capped vertical cylinder SDF (radius = half_sizes[:, 0])
    d_xy = jnp.linalg.norm(p[..., :2] - world.centers[:, :2], axis=-1) \
        - world.half_sizes[:, 0]
    d_z = jnp.abs(p[..., 2] - world.centers[:, 2]) - world.half_sizes[:, 2]
    w = jnp.stack([d_xy, d_z], axis=-1)
    cyl_out = jnp.linalg.norm(jnp.maximum(w, 0.0), axis=-1)
    cyl_in = jnp.minimum(jnp.max(w, axis=-1), 0.0)
    d_cyl = cyl_out + cyl_in
    d = jnp.where(world.shape == SHAPE_CYLINDER, d_cyl, d_box)
    d = jnp.where(world.active, d, jnp.inf)
    return jnp.min(d, axis=-1)
