"""Quadrotor point-dynamics + cascaded setpoint controller.

Replaces PX4 SITL + Gazebo physics in the closed loop. The reference streams
(pos, vel, acc, yaw) setpoints to PX4 OFFBOARD at cmd_hz
(/root/reference/src/planner/scripts/ros_node/traj_planner_node.py:667-703); PX4's
cascaded position/velocity controllers turn them into thrust/attitude. Here the
same cascade is applied directly:

    a_cmd = acc_ff + kp_pos (pos_des - pos) + kp_vel (vel_des - vel)

with an acceleration-authority clamp and linear drag, integrated semi-implicitly at
the command rate. Attitude is the differential-flatness attitude of (a_cmd, yaw) —
what a real quad's body frame does while tracking — which is what points the depth
camera. Fidelity target is tracking error comparable to the reference's logged CSVs
(traj_planner_node.py:310-331), not firmware equivalence (SURVEY.md §7).

Pure function of (state, setpoint) — vmap over envs, no control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from neoplanner_tpu.config import SimParams
from neoplanner_tpu.core import frames
from neoplanner_tpu.core.types import DroneState


def init_state(pos: jnp.ndarray) -> DroneState:
    return DroneState(pos=pos, vel=jnp.zeros(3), quat=frames.quat_identity(),
                      yaw=jnp.zeros(()))


def step(state: DroneState, pos_des: jnp.ndarray, vel_des: jnp.ndarray,
         acc_des: jnp.ndarray, yaw_des: jnp.ndarray, sp: SimParams) -> DroneState:
    """One control+physics step at the command rate."""
    a_cmd = acc_des + sp.kp_pos * (pos_des - state.pos) \
        + sp.kp_vel * (vel_des - state.vel)
    a_norm = jnp.linalg.norm(a_cmd)
    a_cmd = a_cmd * jnp.minimum(1.0, sp.a_max / jnp.maximum(a_norm, 1e-9))

    vel = state.vel + (a_cmd - sp.drag * state.vel) * sp.dt
    pos = state.pos + vel * sp.dt

    # rate-limited yaw tracking (the reference's yaw setpoint follows the path
    # tangent, traj_planner_node.py:685-687)
    dyaw = jnp.arctan2(jnp.sin(yaw_des - state.yaw), jnp.cos(yaw_des - state.yaw))
    dyaw = jnp.clip(dyaw, -sp.yaw_rate_max * sp.dt, sp.yaw_rate_max * sp.dt)
    yaw = state.yaw + dyaw

    quat = frames.quat_from_accel_yaw(a_cmd, yaw, sp.g)
    return DroneState(pos=pos, vel=vel, quat=quat, yaw=yaw)
