"""Exact 2-D Euclidean distance transform on device.

Replaces ``scipy.ndimage.distance_transform_edt`` as used by the reference's ESDF
server (/root/reference/src/planner/scripts/map_server/esdf.py:29). The classic
separable decomposition is used, but phrased as vectorized scans + a chunked min-plus
contraction instead of the sequential lower-envelope algorithm, so it maps onto the
VPU with no data-dependent control flow:

  EDT²(i,j) = min_k ( (i-k)² + G(k,j)² )         (pass 2: min-plus over rows)
  G(k,j)    = |j - nearest occupied l in row k|  (pass 1: two cummax scans)

Pass 1 is O(HW) via ``lax.cummax``; pass 2 is O(H²W) elementwise mins, blocked to
bound VMEM pressure. Both are exact (this is Felzenszwalb's decomposition with a
brute-force lower envelope, which vectorizes perfectly at these grid sizes).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e9)   # "infinite" squared cell distance
_FAR = 1e4                # out-of-map / empty-map distance in meters (esdf.py:66)


def _row_distance_sq(occ: jnp.ndarray) -> jnp.ndarray:
    """Per-row 1-D squared distance (in cells) to the nearest occupied cell.

    occ: (H, W) bool. Returns (H, W) float32, _BIG where a row has no occupied cell.
    """
    W = occ.shape[-1]
    axis = occ.ndim - 1
    idx = jnp.arange(W, dtype=jnp.float32)
    # nearest occupied index to the left (inclusive): running max of idx where occupied
    left = jax.lax.cummax(jnp.where(occ, idx, -_BIG), axis=axis)
    # nearest occupied to the right: reverse running min of idx where occupied
    right = -jax.lax.cummax(jnp.where(occ, -idx, -_BIG), axis=axis, reverse=True)
    dist = jnp.minimum(idx - left, right - idx)
    return jnp.minimum(dist * dist, _BIG)


def _pass2(g2: jnp.ndarray, block: int = 8) -> jnp.ndarray:
    """min-plus contraction over the row axis: out[i,j] = min_k (i-k)^2 + g2[k,j].

    Blocked over output rows to keep the (block, H, W) broadcast small.
    """
    H, W = g2.shape
    pad = (-H) % block
    hpad = H + pad
    rows = jnp.arange(hpad, dtype=jnp.float32)
    ks = jnp.arange(H, dtype=jnp.float32)

    def one_block(i0):
        i = jax.lax.dynamic_slice_in_dim(rows, i0 * block, block)      # (B,)
        d2 = (i[:, None] - ks[None, :]) ** 2                            # (B, H)
        return jnp.min(d2[:, :, None] + g2[None, :, :], axis=1)         # (B, W)

    out = jax.lax.map(one_block, jnp.arange(hpad // block))
    return out.reshape(hpad, W)[:H]


def edt_sq_cells(occupancy: jnp.ndarray) -> jnp.ndarray:
    """Exact squared EDT in cell units. occupancy: (H, W), nonzero = occupied."""
    occ = occupancy > 0.5
    g2 = _row_distance_sq(occ)
    H = occupancy.shape[0]
    if jax.default_backend() == "tpu" and H % 8 == 0:
        from neoplanner_tpu.ops import edt_pallas
        return edt_pallas.pass2(g2)
    return _pass2(g2)


def _pass2_banded(g2: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Banded min-plus: out[i,j] = min_{|d|<=radius} (d² + g2[i+d, j]), clamped
    at radius². An unrolled chain of 2·radius shifted adds+mins that XLA fuses
    into one elementwise kernel — O(H·W·2R) instead of pass 2's O(H²·W)."""
    H, W = g2.shape
    r2 = jnp.float32(radius * radius)
    out = jnp.minimum(g2, r2)
    big = jnp.full((1, W), _BIG)
    for d in range(1, min(radius, H - 1) + 1):
        dd = jnp.float32(d * d)
        down = jnp.concatenate([g2[d:], jnp.broadcast_to(big, (d, W))])
        up = jnp.concatenate([jnp.broadcast_to(big, (d, W)), g2[:-d]])
        out = jnp.minimum(out, jnp.minimum(down, up) + dd)
    return jnp.minimum(out, r2)


def edt_truncated(occupancy: jnp.ndarray, resolution, max_dist: float
                  ) -> jnp.ndarray:
    """EDT in meters, exact below ``max_dist`` and clamped to it above.

    The closed loop only consumes distances below ~safe_dis (collision hinge,
    metric, local-target escape, wavefront blocking all compare against
    0.4-0.7 m — expert_planner.py:417, traj_planner_node.py:355,
    geo_planner.py:41), so a truncated field is loop-equivalent while the
    banded pass 2 does R/H of the exact transform's work. Truncation is exact:
    any true distance < max_dist has its row offset |i-k| < R, inside the band.
    """
    res = float(resolution)
    radius = max(1, int(math.ceil(max_dist / res)))
    occ = occupancy > 0.5
    g2 = jnp.minimum(_row_distance_sq(occ), jnp.float32((radius + 1) ** 2))
    H = occupancy.shape[0]
    if jax.default_backend() == "tpu" and H % 8 == 0 and radius < H:
        from neoplanner_tpu.ops import edt_pallas
        d2 = edt_pallas.pass2_banded(g2, radius)
    else:
        d2 = _pass2_banded(g2, radius)
    d = jnp.sqrt(d2) * res
    return jnp.minimum(d, max_dist)


def edt(occupancy: jnp.ndarray, resolution) -> jnp.ndarray:
    """EDT in meters; matches scipy.ndimage.distance_transform_edt(1-occ)*res
    (esdf.py:29). Grids with no occupied cell at all return _FAR everywhere.
    """
    d2 = edt_sq_cells(occupancy)
    d = jnp.sqrt(d2) * resolution
    return jnp.where(d2 >= _BIG, _FAR, jnp.minimum(d, _FAR))


def central_gradient(field: jnp.ndarray, spacing) -> tuple[jnp.ndarray, jnp.ndarray]:
    """np.gradient-equivalent central differences (one-sided at the borders).

    Returns (d/drow, d/dcol) = (grad_y, grad_x) for a (H, W) field, divided by
    ``spacing`` so the result is a true per-meter gradient. (The reference leaves
    np.gradient in per-cell units — esdf.py:33 — which silently scales its collision
    gradient by the resolution; parity tests re-apply that scale explicitly.)
    """
    gy = (jnp.roll(field, -1, axis=0) - jnp.roll(field, 1, axis=0)) * 0.5
    gy = gy.at[0].set(field[1] - field[0]).at[-1].set(field[-1] - field[-2])
    gx = (jnp.roll(field, -1, axis=1) - jnp.roll(field, 1, axis=1)) * 0.5
    gx = gx.at[:, 0].set(field[:, 1] - field[:, 0])
    gx = gx.at[:, -1].set(field[:, -1] - field[:, -2])
    return gy / spacing, gx / spacing
