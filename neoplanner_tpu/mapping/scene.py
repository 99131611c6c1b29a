"""Analytic 2-D scene map: exact signed distance to the obstacle footprints.

A TPU-first alternative to the grid ESDF for simulation-side planning: when the
ground-truth scene is available (the reference's global-map mode,
sim_global.launch), the collision term can query the *analytic* signed distance
to the box/cylinder footprints instead of a rasterized EDT. Advantages over the
grid:

- no gathers: min over K primitives of closed-form distances — pure fused VPU
  arithmetic, the hot-loop-friendly form (grid sampling costs one 4-way gather
  per sample per evaluation);
- exact and smooth (no 0.1 m quantization);
- *signed*: the distance is negative inside obstacles, so the collision
  gradient keeps pushing when a trajectory sample lands inside one — the
  reference's EDT is zero with zero gradient there (esdf.py:29), a plateau its
  optimizer can stall on.

The vision-based onboard mode still uses the grid ESDF (there is no analytic
scene for a sensed map).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from neoplanner_tpu.config import MapParams
from neoplanner_tpu.core.types import SHAPE_CYLINDER, BoxWorld


@struct.dataclass
class SceneMap:
    centers: jnp.ndarray   # (K, 2) footprint centers
    half: jnp.ndarray      # (K, 2) half extents (cylinders: radius in [:, 0])
    is_cyl: jnp.ndarray    # (K,) bool
    active: jnp.ndarray    # (K,) bool (inactive or out-of-slice prims masked)


def build(world: BoxWorld, mp: MapParams) -> SceneMap:
    """Project the scene onto the occupancy slice [z_min, z_max] (the same
    footprint the octomap projection would produce)."""
    z_lo = world.centers[:, 2] - world.half_sizes[:, 2]
    z_hi = world.centers[:, 2] + world.half_sizes[:, 2]
    in_slice = (z_hi > mp.z_min) & (z_lo < mp.z_max)
    return SceneMap(centers=world.centers[:, :2], half=world.half_sizes[:, :2],
                    is_cyl=world.shape == SHAPE_CYLINDER,
                    active=world.active & in_slice)


def _safe_norm(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm with a well-defined (zero) gradient at the origin — a bare
    jnp.linalg.norm back-propagates NaN there, which poisons every trajectory
    sample that lands exactly on a box center."""
    sq = jnp.sum(v * v, axis=axis)
    safe = sq > 0
    return jnp.where(safe, jnp.sqrt(jnp.where(safe, sq, 1.0)), 0.0)


def sample(scene: SceneMap, pos: jnp.ndarray):
    """Signed distance and gradient at (..., 2) points.

    Returns (dis (...,), grad (..., 2)) with d < 0 inside footprints. With no
    active primitive the distance is the ESDF far value (1e4) and grad 0.
    """
    d = pos[..., None, :] - scene.centers                      # (..., K, 2)
    # box footprint SDF
    q = jnp.abs(d) - scene.half
    box_out = _safe_norm(jnp.maximum(q, 0.0))
    box_in = jnp.minimum(jnp.maximum(q[..., 0], q[..., 1]), 0.0)
    d_box = box_out + box_in
    # circular footprint SDF
    r = _safe_norm(d)
    d_cyl = r - scene.half[..., 0]
    dist_k = jnp.where(scene.is_cyl, d_cyl, d_box)             # (..., K)
    dist_k = jnp.where(scene.active, dist_k, 1e4)
    dis = jnp.min(dist_k, axis=-1)

    # gradient of the min via the argmin primitive's analytic gradient
    k = jnp.argmin(dist_k, axis=-1)
    dk = jnp.take_along_axis(d, k[..., None, None].repeat(2, -1),
                             axis=-2).squeeze(-2)              # (..., 2)
    halfk = scene.half[k]
    cylk = scene.is_cyl[k]
    qk = jnp.abs(dk) - halfk
    # box gradient: outside -> normalized positive part; inside -> axis of max q
    outside = jnp.maximum(qk, 0.0)
    nrm = jnp.linalg.norm(outside, axis=-1, keepdims=True)
    g_out = jnp.sign(dk) * outside / jnp.maximum(nrm, 1e-9)
    ax = (qk[..., 1] > qk[..., 0]).astype(pos.dtype)           # 1 if y-axis
    g_in = jnp.sign(dk) * jnp.stack([1.0 - ax, ax], axis=-1)
    g_box = jnp.where(nrm > 1e-9, g_out, g_in)
    g_cyl = dk / jnp.maximum(jnp.linalg.norm(dk, axis=-1, keepdims=True), 1e-9)
    grad = jnp.where(cylk[..., None], g_cyl, g_box)
    no_active = ~jnp.any(scene.active)
    grad = jnp.where(no_active, 0.0, grad)
    return dis, grad
