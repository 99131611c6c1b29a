"""Quaternion / rotation utilities (wxyz convention), fully batched.

Replaces the reference's pyquaternion usage (traj_planner_node.py:164-181,
record_planner.py:13-58) with vectorized jnp ops. All functions broadcast over
leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (body -> world for an attitude quat)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conjugate(q), v)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 3, 3) rotation matrix (row-major, body->world)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_from_yaw(yaw: jnp.ndarray) -> jnp.ndarray:
    half = yaw * 0.5
    zeros = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


def yaw_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def quat_from_accel_yaw(acc: jnp.ndarray, yaw: jnp.ndarray, g: float = 9.81) -> jnp.ndarray:
    """Differential-flatness attitude: body z aligns with thrust = acc + g*e_z.

    Used in place of PX4's attitude loop so the depth camera points where a real
    quad's camera would while tracking (pos, vel, acc, yaw) setpoints
    (traj_planner_node.py:667-698).
    """
    thrust = acc + jnp.stack(
        [jnp.zeros_like(acc[..., 0]), jnp.zeros_like(acc[..., 0]),
         jnp.full_like(acc[..., 0], g)], axis=-1)
    zb = thrust / (jnp.linalg.norm(thrust, axis=-1, keepdims=True) + 1e-9)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    xc = jnp.stack([cy, sy, jnp.zeros_like(cy)], axis=-1)
    yb = jnp.cross(zb, xc)
    yb = yb / (jnp.linalg.norm(yb, axis=-1, keepdims=True) + 1e-9)
    xb = jnp.cross(yb, zb)
    rot = jnp.stack([xb, yb, zb], axis=-1)  # columns are body axes in world frame
    return matrix_to_quat(rot)


def matrix_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz. Branch-free Shepperd-style conversion."""
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick the numerically best by largest pivot
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    w_big = jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw),
                       (m10 - m01) / (4 * qw)], axis=-1)
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    x_big = jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx),
                       (m02 + m20) / (4 * qx)], axis=-1)
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    y_big = jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy,
                       (m12 + m21) / (4 * qy)], axis=-1)
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    z_big = jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz),
                       (m12 + m21) / (4 * qz), qz], axis=-1)
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22],
                       axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([w_big, x_big, y_big, z_big], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, axis=-1),
                            axis=-2).squeeze(-2)
    return quat_normalize(q)
