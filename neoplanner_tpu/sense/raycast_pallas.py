"""Fused Pallas depth renderer: the whole ray-vs-scene trace in one kernel.

The XLA renderer (sense/raycast.py) chunks primitives under a fori_loop whose
per-chunk temporaries and accumulator round-trips dominate its wall time
(~43 ms per 512-env 160x120 frame, round-3 profile) — at sensor-rate fusion
(fuse_frames=6) that made rendering the single largest stage of the vision
loop.

Round-5 layout rewrite: the round-3/4 kernel traced rays as (1, tile) lane
vectors — one sublane of the 8x128 VPU in use (7/8 idle) — across ~78k tiny
programs per 4096-env strided frame (program dispatch dominated: a strided
30-row frame measured *slower* than the full 120-row one,
examples/probe_fusion.py round 5). Now:

  - rays tile 2-D, (R8, 128) sublanes x lanes — full VPU occupancy;
  - one program traces _E_B envs start-to-finish (grid = E/_E_B programs);
  - the camera->world rotation happens IN the kernel from 12 SMEM scalars
    per env; the shared camera-frame base directions are one (3*R8, 128)
    VMEM block reused by every program. The (E, 3, R) world-direction
    tensor (~1 GB at B=4096, and pure HBM traffic) no longer exists;
  - the z-depth conversion and range validity happen in-kernel too (the
    body-x component of a unit camera ray IS the cos factor), so the only
    HBM traffic is the depth image out plus the per-env prim tables.

Same math as raycast._ray_box / _ray_cylinder / ground plane (which mirror
Gazebo's depth camera against the same primitives); golden test
tests/test_sense.py::test_pallas_renderer_matches_xla pins equality.

Batching: custom_vmap collapse over the env axis (same pattern as the
objective kernels) — call :func:`render_depth` with single-env arguments
under any vmap nesting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neoplanner_tpu.config import CameraParams
from neoplanner_tpu.core import frames
from neoplanner_tpu.core.types import SHAPE_CYLINDER, BoxWorld
from neoplanner_tpu.sense import raycast

_INF = 1e9
_E_B = 4   # envs per program


def _vmem_params(R8: int):
    """Raised scoped-VMEM limit for big frames (CLAUDE.md rule 14), None
    for small ones so every validated small-frame compile stays
    byte-identical (no compiler_params -> same cache key).

    The compiler's own scoped-OOM reports at R8=2400 (640x480 full-res)
    calibrate an affine live-set model: 20.87 MB at E_b=4, 16.19 MB at
    E_b=2 -> ~9.4 base tiles + ~1.9 tiles per env (NOT the naive
    3 + 4*E_b: Mosaic keeps more temporaries live across the trace loop).
    Full-res frames therefore cannot fit the 16 MB default at any E_b>=1;
    shrinking E_b (tried in the r5b/r5c runs) just walks the OOM down, so
    keep E_b=4 and raise the limit instead — v5e has 128 MB of VMEM and
    the in/out blocks only need ~10 MB of it at full res."""
    tile = R8 * 128 * 4
    need = tile * (10 + 2 * _E_B)          # affine model + margin
    if need <= 15 * 2 ** 20:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _make_kernel(E_b, R8, min_range, max_range):
    """Trace E_b envs' full ray grids against their prim tables.

    The table arrives sorted boxes-first, cylinders, inactive (host-side
    stable argsort) with per-env counts in SMEM, so the per-prim loops have
    *dynamic* trip counts: each ray pays exactly n_box slab tests plus n_cyl
    quadratic tests instead of K x (slab + quadratic + active mask)."""

    def kernel(cnt_ref, prims_ref, pose_ref, base_ref, out_ref):
        bx = base_ref[0:R8]              # (R8, 128) camera-frame unit dirs
        by = base_ref[R8:2 * R8]
        bz = base_ref[2 * R8:3 * R8]

        def safe_inv(d):
            return 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)

        for e in range(E_b):
            # world-frame directions from the env's rotation (12 SMEM
            # scalars: row-major 3x3 + origin)
            dx = pose_ref[e, 0, 0] * bx + pose_ref[e, 0, 1] * by \
                + pose_ref[e, 0, 2] * bz
            dy = pose_ref[e, 0, 3] * bx + pose_ref[e, 0, 4] * by \
                + pose_ref[e, 0, 5] * bz
            dz = pose_ref[e, 0, 6] * bx + pose_ref[e, 0, 7] * by \
                + pose_ref[e, 0, 8] * bz
            ox = pose_ref[e, 0, 9]
            oy = pose_ref[e, 0, 10]
            oz = pose_ref[e, 0, 11]
            invx = safe_inv(dx)
            invy = safe_inv(dy)
            invz = safe_inv(dz)
            n_box = cnt_ref[e, 0, 0]
            n_act = cnt_ref[e, 0, 1]

            def body_box(k, t, e=e, invx=invx, invy=invy, invz=invz,
                         ox=ox, oy=oy, oz=oz):
                base = k * 8
                cx = prims_ref[e, 0, base + 0]
                cy = prims_ref[e, 0, base + 1]
                cz = prims_ref[e, 0, base + 2]
                hx = prims_ref[e, 0, base + 3]
                hy = prims_ref[e, 0, base + 4]
                hz = prims_ref[e, 0, base + 5]
                # slab test (raycast._ray_box)
                lox = (cx - hx - ox) * invx
                hix = (cx + hx - ox) * invx
                loy = (cy - hy - oy) * invy
                hiy = (cy + hy - oy) * invy
                loz = (cz - hz - oz) * invz
                hiz = (cz + hz - oz) * invz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(lox, hix),
                                               jnp.minimum(loy, hiy)),
                                   jnp.minimum(loz, hiz))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(lox, hix),
                                               jnp.maximum(loy, hiy)),
                                   jnp.maximum(loz, hiz))
                hit_box = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin > 0)
                return jnp.minimum(t, jnp.where(hit_box, tmin, _INF))

            def body_cyl(k, t, e=e, dx=dx, dy=dy, dz=dz, invz=invz,
                         ox=ox, oy=oy, oz=oz):
                base = k * 8
                cx = prims_ref[e, 0, base + 0]
                cy = prims_ref[e, 0, base + 1]
                cz = prims_ref[e, 0, base + 2]
                hx = prims_ref[e, 0, base + 3]
                hz = prims_ref[e, 0, base + 5]
                # vertical capped cylinder (raycast._ray_cylinder)
                rox = ox - cx
                roy = oy - cy
                a = dx * dx + dy * dy
                b = 2.0 * (rox * dx + roy * dy)
                c = rox * rox + roy * roy - hx * hx
                disc = b * b - 4.0 * a * c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                a_safe = jnp.where(a < 1e-12, 1e-12, a)
                t_side = (-b - sq) / (2.0 * a_safe)
                z_at = oz + t_side * dz - cz
                side_ok = (disc > 0) & (t_side > 0) & (jnp.abs(z_at) <= hz)
                t_cyl = jnp.where(side_ok, t_side, _INF)
                roz = oz - cz
                for sgn in (-1.0, 1.0):
                    t_cap = (sgn * hz - roz) * invz
                    xc = rox + t_cap * dx
                    yc = roy + t_cap * dy
                    cap_ok = (t_cap > 0) & (xc * xc + yc * yc <= hx * hx)
                    t_cyl = jnp.minimum(t_cyl, jnp.where(cap_ok, t_cap, _INF))
                return jnp.minimum(t, t_cyl)

            t = jnp.full((R8, 128), _INF, jnp.float32)
            t = jax.lax.fori_loop(0, n_box, body_box, t)
            t = jax.lax.fori_loop(n_box, n_act, body_cyl, t)

            # ground plane (raycast._trace_rays)
            t_ground = jnp.where(dz < -1e-6,
                                 -oz / jnp.where(dz < -1e-6, dz, -1.0), _INF)
            t = jnp.minimum(t, t_ground)

            # z-depth = range * body-x component (Gazebo-style,
            # raycast.render_depth); bx IS the cos factor
            z = t * bx
            valid = (t < _INF) & (z >= min_range) & (z <= max_range)
            out_ref[e] = jnp.where(valid, z, max_range)

    return kernel


def _pack_prims(world: BoxWorld):
    """Batched BoxWorld -> sorted (E, K*8) scalar table + (E, 2) int32
    [n_box, n_active] counts.

    Rows are stably sorted active-boxes / active-cylinders / inactive so the
    kernel's dynamic-trip-count loops visit exactly the live prims of each
    shape (the inactive tail is never read)."""
    is_cyl = (world.shape == SHAPE_CYLINDER)
    key = jnp.where(world.active, is_cyl.astype(jnp.int32), 2)      # (E, K)
    order = jnp.argsort(key, axis=-1, stable=True)
    prims = jnp.concatenate(
        [world.centers, world.half_sizes,
         is_cyl[..., None].astype(jnp.float32),
         world.active[..., None].astype(jnp.float32)], axis=-1)     # (E,K,8)
    prims = jnp.take_along_axis(prims, order[..., None], axis=1)
    counts = jnp.stack([(key == 0).sum(-1), (key <= 1).sum(-1)],
                       axis=-1).astype(jnp.int32)                   # (E, 2)
    return prims.reshape(prims.shape[0], -1), counts


def _trace_batch(base: jnp.ndarray, pose: jnp.ndarray, prims: jnp.ndarray,
                 counts: jnp.ndarray, R: int, min_range: float,
                 max_range: float, interpret: bool) -> jnp.ndarray:
    """base (3*R8, 128) camera-frame rays in 2-D tile layout (shared across
    envs), pose (E, 12) row-major rotation + origin, prims (E, K*8) sorted +
    counts (E, 2) -> (E, R) z-depths."""
    E = pose.shape[0]
    K8 = prims.shape[1]
    R8 = base.shape[0] // 3
    e_b = _E_B
    cparams = _vmem_params(R8)
    kernel = _make_kernel(e_b, R8, min_range, max_range)
    ep = E + ((-E) % e_b)
    if ep != E:
        pad = ep - E
        pose = jnp.concatenate([pose, jnp.zeros((pad, 12), pose.dtype)])
        prims = jnp.concatenate([prims, jnp.zeros((pad, K8), prims.dtype)])
        counts = jnp.concatenate(
            [counts, jnp.zeros((pad, 2), counts.dtype)])

    out = pl.pallas_call(
        kernel,
        grid=(ep // e_b,),
        in_specs=[
            # SMEM blocks: unit middle axis makes trailing dims shape-equal
            pl.BlockSpec((e_b, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((e_b, 1, K8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((e_b, 1, 12), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            # the base-direction tile is the same block for every program
            pl.BlockSpec((3 * R8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((e_b, R8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ep, R8, 128), jnp.float32),
        interpret=interpret,
        compiler_params=cparams,
        cost_estimate=pl.CostEstimate(flops=ep * R8 * 128 * (K8 // 8) * 60,
                                      bytes_accessed=ep * (R8 * 128 + K8) * 4
                                      + 3 * R8 * 128 * 4,
                                      transcendentals=ep * R8 * 128),
    )(counts[:, None, :], prims.astype(jnp.float32)[:, None, :],
      pose.astype(jnp.float32)[:, None, :], base)
    return out.reshape(ep, R8 * 128)[:E, :R]


@functools.lru_cache(maxsize=None)
def _base_dirs(cam: CameraParams, row_stride: int):
    """Camera-frame unit directions in the kernel's (3*R8, 128) tile layout,
    padded with +x rays (bx=1: they trace cheaply and are sliced off).
    Computed in numpy (raycast.ray_dirs_camera's exact math) so the cached
    constant is concrete even when first requested under a jit trace."""
    import numpy as np
    u = np.arange(cam.width, dtype=np.float32) + np.float32(0.5)
    v = np.arange(row_stride // 2, cam.height, row_stride,
                  dtype=np.float32) + np.float32(0.5)
    x_opt = (u[None, :] - np.float32(cam.width / 2)) / np.float32(cam.fx)
    y_opt = (v[:, None] - np.float32(cam.height / 2)) / np.float32(cam.fy)
    ones = np.ones((v.shape[0], cam.width), np.float32)
    d = np.stack([ones, -x_opt * ones, -y_opt * ones], axis=-1)
    nrm = np.sqrt((d * d).sum(-1, keepdims=True, dtype=np.float32))
    d = (d / nrm).reshape(-1, 3)
    R = d.shape[0]
    R8 = -(-R // 128)
    R8 += (-R8) % 8          # sublane dim padded to a multiple of 8
    pad = R8 * 128 - R
    filler = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (pad, 1))
    d = np.concatenate([d.astype(np.float32), filler])
    base = d.T.reshape(3 * R8, 128)    # rows [x*R8, y*R8, z*R8]
    return base, R, R8      # numpy: the lru_cache must not hold tracers


def _render_flat(world_leaves, pos, quat, cam: CameraParams, row_stride: int,
                 interpret: bool):
    """Batched render: leaves of a BoxWorld with leading env axis E."""
    world = BoxWorld(*world_leaves)
    base_np, R, R8 = _base_dirs(cam, row_stride)
    base = jnp.asarray(base_np)
    rot = jax.vmap(frames.quat_to_matrix)(quat)                 # (E, 3, 3)
    pose = jnp.concatenate([rot.reshape(-1, 9), pos], axis=1)   # (E, 12)
    prims, counts = _pack_prims(world)
    depth = _trace_batch(base, pose, prims, counts, R,
                         cam.min_range, cam.max_range, interpret)
    return depth.reshape(pos.shape[0], -1, cam.width)


@functools.lru_cache(maxsize=None)
def _flat_render(cam: CameraParams, row_stride: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def render_flat(centers, half, active, shape, pos, quat):
        return _render_flat((centers, half, active, shape), pos, quat, cam,
                            row_stride, interpret)

    def rule(axis_size, in_batched, *args):
        flat = []
        for a, b in zip(args, in_batched):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            flat.append(a.reshape((-1,) + a.shape[2:]))
        out = render_flat(*flat)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    render_flat.def_vmap(rule)
    return render_flat


def render_depth(world: BoxWorld, pos: jnp.ndarray, quat: jnp.ndarray,
                 cam: CameraParams, row_stride: int = 1,
                 interpret: bool = False) -> jnp.ndarray:
    """(H, W) z-depth image — kernel-fused equivalent of
    raycast.render_depth; single-env signature, vmappable over envs."""
    return _flat_render(cam, row_stride, interpret)(
        world.centers[None], world.half_sizes[None], world.active[None],
        world.shape[None], pos[None], quat[None])[0]
