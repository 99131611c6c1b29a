"""Analytic depth-camera renderer over primitive scenes.

Replaces the Gazebo depth camera (the reference's only exteroceptive sensor,
`/iris/camera/depth/*` from iris_depth_camera.sdf, consumed at
traj_planner_node.py:135, 224-225). Because scenes are arrays of boxes/cylinders,
rendering is exact analytic ray-primitive intersection — one fused (H·W × K)
slab/quadratic test per frame on the VPU, no marching, no voxel gathers, no
data-dependent control flow. vmap over envs renders thousands of frames per step.

Conventions match the reference: camera looks along body +x with the standard
optical frame (tf_server.launch:12-17's -90° optical rotation), returns z-depth
(not ray length) like Gazebo, max_range where no hit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neoplanner_tpu.config import CameraParams
from neoplanner_tpu.core import frames
from neoplanner_tpu.core.types import SHAPE_CYLINDER, BoxWorld

_INF = 1e9


def ray_dirs_camera(cam: CameraParams, row_stride: int = 1) -> jnp.ndarray:
    """(H, W, 3) unit ray directions in the *body* frame (x fwd, y left, z up).

    Optical-frame pixel rays ((u-cx)/fx, (v-cy)/fy, 1) are rotated into the body
    frame: optical z -> body x, optical x -> -body y, optical y -> -body z.

    row_stride > 1 keeps every stride-th row (centered offset) at the SAME
    vertical FOV — a coarse vertical sampling for fusion-only frames, whose
    2-D polar consumers reduce each column to one range anyway
    (occupancy.polar_columns). Shrinking cam.height instead would narrow the
    FOV (fy is tied to fx).
    """
    u = jnp.arange(cam.width) + 0.5
    v = jnp.arange(row_stride // 2, cam.height, row_stride) + 0.5
    x_opt = (u[None, :] - cam.width / 2) / cam.fx
    y_opt = (v[:, None] - cam.height / 2) / cam.fy
    ones = jnp.ones((v.shape[0], cam.width))
    d_body = jnp.stack([ones, -x_opt * ones, -y_opt * ones], axis=-1)
    return d_body / jnp.linalg.norm(d_body, axis=-1, keepdims=True)


def _ray_box(o, d, centers, half):
    """Entry distance of rays (..., 3) into boxes (K, 3): (..., K)."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    lo = (centers - half - o[..., None, :]) * inv[..., None, :]
    hi = (centers + half - o[..., None, :]) * inv[..., None, :]
    tmin = jnp.max(jnp.minimum(lo, hi), axis=-1)
    tmax = jnp.min(jnp.maximum(lo, hi), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    return jnp.where(hit & (tmin > 0), tmin, _INF)


def _ray_cylinder(o, d, centers, half):
    """Entry distance into vertical capped cylinders (radius = half[:, 0])."""
    ox = o[..., None, 0] - centers[:, 0]
    oy = o[..., None, 1] - centers[:, 1]
    dx = d[..., None, 0]
    dy = d[..., None, 1]
    r = half[:, 0]
    a = dx * dx + dy * dy
    b = 2 * (ox * dx + oy * dy)
    c = ox * ox + oy * oy - r * r
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a < 1e-12, 1e-12, a)
    t_side = (-b - sq) / (2 * a_safe)
    z_at = o[..., None, 2] + t_side * d[..., None, 2]
    z_ok = jnp.abs(z_at - centers[:, 2]) <= half[:, 2]
    side = jnp.where((disc > 0) & (t_side > 0) & z_ok, t_side, _INF)
    # caps
    dz = d[..., None, 2]
    dz_safe = jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
    oz = o[..., None, 2] - centers[:, 2]
    t_caps = []
    for sgn in (-1.0, 1.0):
        t = (sgn * half[:, 2] - oz) / dz_safe
        xc = ox + t * dx
        yc = oy + t * dy
        ok = (t > 0) & (xc * xc + yc * yc <= r * r)
        t_caps.append(jnp.where(ok, t, _INF))
    return jnp.minimum(side, jnp.minimum(*t_caps))


# primitives tested per scan step: the live slab-test temporary is
# (..., H, W, _PRIM_CHUNK) instead of (..., H, W, K). Row-chunking (round 1)
# bounded the per-env temporary but not the vmapped batch's — a 4096-env
# 160x120x24 render materialized 2 x 7.5 GB and OOMed the chip.
_PRIM_CHUNK = 4


def _trace_chunk(world: BoxWorld, pos: jnp.ndarray, dirs: jnp.ndarray,
                 sl) -> jnp.ndarray:
    """Min hit distance of rays against one slice of the primitive arrays."""
    centers = world.centers[sl]
    half = world.half_sizes[sl]
    t_box = _ray_box(pos, dirs, centers, half)
    t_cyl = _ray_cylinder(pos, dirs, centers, half)
    t_prim = jnp.where(world.shape[sl] == SHAPE_CYLINDER, t_cyl, t_box)
    t_prim = jnp.where(world.active[sl], t_prim, _INF)
    return jnp.min(t_prim, axis=-1)


def _trace_rays(world: BoxWorld, pos: jnp.ndarray, dirs: jnp.ndarray
                ) -> jnp.ndarray:
    """Nearest-hit distance for rays (..., 3) against the scene + ground.

    Primitives are tested _PRIM_CHUNK at a time under a fori_loop carrying the
    running min, so the temporary stays (..., chunk)-wide however large the
    (vmapped) ray batch is. K is padded to the chunk at trace time (inactive
    primitives already resolve to _INF).
    """
    K = world.centers.shape[0]
    n_chunks = -(-K // _PRIM_CHUNK)

    if n_chunks <= 1:
        t = _trace_chunk(world, pos, dirs, slice(0, K))
    else:
        pad = n_chunks * _PRIM_CHUNK - K
        if pad:
            world = BoxWorld(
                centers=jnp.pad(world.centers, ((0, pad), (0, 0))),
                half_sizes=jnp.pad(world.half_sizes, ((0, pad), (0, 0)),
                                   constant_values=0.01),
                active=jnp.pad(world.active, (0, pad)),
                shape=jnp.pad(world.shape, (0, pad)))

        def body(c, t):
            sl = jax.lax.dynamic_slice_in_dim  # noqa: F841 (doc)
            start = c * _PRIM_CHUNK
            w = BoxWorld(
                centers=jax.lax.dynamic_slice_in_dim(world.centers, start,
                                                     _PRIM_CHUNK),
                half_sizes=jax.lax.dynamic_slice_in_dim(world.half_sizes,
                                                        start, _PRIM_CHUNK),
                active=jax.lax.dynamic_slice_in_dim(world.active, start,
                                                    _PRIM_CHUNK),
                shape=jax.lax.dynamic_slice_in_dim(world.shape, start,
                                                   _PRIM_CHUNK))
            return jnp.minimum(t, _trace_chunk(w, pos, dirs,
                                               slice(0, _PRIM_CHUNK)))

        t0 = jnp.full(dirs.shape[:-1], _INF)
        t = jax.lax.fori_loop(0, n_chunks, body, t0)

    dz = dirs[..., 2]
    t_ground = jnp.where(dz < -1e-6, -pos[2] / jnp.where(dz < -1e-6, dz, -1.0),
                         _INF)
    return jnp.minimum(t, t_ground)


def render_depth(world: BoxWorld, pos: jnp.ndarray, quat: jnp.ndarray,
                 cam: CameraParams, row_stride: int = 1) -> jnp.ndarray:
    """(H, W) z-depth image from a camera at `pos` with body attitude `quat`.
    row_stride > 1 renders only every stride-th row (same FOV) — the cheap
    form for fusion-only frames."""
    dirs_body = ray_dirs_camera(cam, row_stride)           # (H, W, 3)
    dirs = frames.quat_rotate(quat[None, None, :], dirs_body)
    t = _trace_rays(world, pos, dirs)

    # z-depth = range along the body-x (optical-z) axis, Gazebo-style
    x_body = frames.quat_rotate(quat, jnp.array([1.0, 0.0, 0.0]))
    z_depth = t * jnp.einsum("hwd,d->hw", dirs, x_body)
    valid = (t < _INF) & (z_depth >= cam.min_range) & (z_depth <= cam.max_range)
    return jnp.where(valid, z_depth, cam.max_range)


def render_depth_auto(world: BoxWorld, pos: jnp.ndarray, quat: jnp.ndarray,
                      cam: CameraParams, row_stride: int = 1) -> jnp.ndarray:
    """render_depth, via the fused Pallas trace kernel on TPU
    (sense/raycast_pallas.py; NEO_RENDER_BACKEND=xla reverts for A/B)."""
    import os
    if (jax.default_backend() == "tpu"
            and os.environ.get("NEO_RENDER_BACKEND", "pallas") != "xla"):
        from neoplanner_tpu.sense import raycast_pallas
        return raycast_pallas.render_depth(world, pos, quat, cam, row_stride)
    return render_depth(world, pos, quat, cam, row_stride)


def depth_to_points(depth: jnp.ndarray, pos: jnp.ndarray, quat: jnp.ndarray,
                    cam: CameraParams):
    """Back-project a depth image to world points: ((H, W, 3), hit_mask (H, W))."""
    dirs_body = ray_dirs_camera(cam)
    x_comp = dirs_body[..., 0]                             # body-x component
    rng = depth / jnp.maximum(x_comp, 1e-6)                # ray length from z-depth
    pts_body = dirs_body * rng[..., None]
    pts = pos + frames.quat_rotate(quat[None, None, :], pts_body)
    hit = depth < cam.max_range - 1e-4
    return pts, hit
