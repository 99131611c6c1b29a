"""Pytree state containers.

The reference keeps its world state smeared across ROS processes (octomap_server's
grid, the planner node's DroneState / des_state_array, PX4's vehicle state). Here the
whole closed loop is one device-resident pytree; every field carries a leading env
batch axis when vmapped.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Trajectory:
    """A solved piecewise-quintic trajectory (MINCO representation).

    Mirrors what the reference stores on the planner object after a solve
    (expert_planner.py:227-234): intermediate waypoints, piece durations, and the
    polynomial coefficients.
    """

    int_wpts: jnp.ndarray   # (D, M-1) intermediate waypoints (column-major as reference)
    ts: jnp.ndarray         # (M,) piece durations
    coeffs: jnp.ndarray     # (6M, D) stacked quintic coefficients
    costs: jnp.ndarray      # (4,) unweighted [energy, time, feasibility, collision]
    ok: jnp.ndarray         # () bool: solve accepted (collision cost under tolerance)
    iters: jnp.ndarray      # () int: L-BFGS iterations actually spent


@struct.dataclass
class DroneState:
    """Vehicle state (traj_planner_node.py:49-55)."""

    pos: jnp.ndarray        # (3,) world position
    vel: jnp.ndarray        # (3,) world velocity
    quat: jnp.ndarray       # (4,) wxyz attitude, body->world
    yaw: jnp.ndarray        # () yaw angle

    @property
    def local_vel(self) -> jnp.ndarray:
        from neoplanner_tpu.core import frames
        return frames.quat_rotate_inv(self.quat, self.vel)


@struct.dataclass
class ESDFMap:
    """Device-resident 2-D occupancy + Euclidean distance field + gradient.

    Replaces the host-side ESDF class (map_server/esdf.py:7-82). Shapes are static;
    origin/resolution ride along as (traced) scalars so one compiled program serves
    every world.
    """

    occupancy: jnp.ndarray  # (H, W) float {0, 1}
    esdf: jnp.ndarray       # (H, W) distance to nearest occupied cell [m]
    grad_x: jnp.ndarray     # (H, W) d esdf / dx  (central differences)
    grad_y: jnp.ndarray     # (H, W) d esdf / dy
    origin: jnp.ndarray     # (2,) world coords of cell (0, 0) center
    resolution: jnp.ndarray # () m per cell


@struct.dataclass
class BoxWorld:
    """Obstacle scene of axis-aligned boxes and vertical cylinders
    (generate_worlds.py:100-146 produces the same thing as Gazebo XML; the
    reference's stock worlds — e.g. poles.world — also contain cylinders)."""

    centers: jnp.ndarray    # (K, 3)
    half_sizes: jnp.ndarray # (K, 3); for cylinders, [:, 0] is the radius
    active: jnp.ndarray     # (K,) bool — static capacity K, masked population
    shape: jnp.ndarray      # (K,) int32: SHAPE_BOX or SHAPE_CYLINDER


SHAPE_BOX = 0
SHAPE_CYLINDER = 1
