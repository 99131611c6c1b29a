"""Network I/O formation: depth+state -> input tensors, expert solution -> labels.

Vectorized re-derivation of the reference's form_nn_input / form_nn_output
(/root/reference/src/planner/scripts/traj_planner/record_planner.py:13-72) and
process_input_np (nn_trainer.py:52-59). All functions are jnp, broadcast over
leading batch axes, and are shared by the recorder (label side), the trainer
(dataset side) and the NN planner (inference side) — one definition, no skew.
"""

from __future__ import annotations

import jax.numpy as jnp

from neoplanner_tpu.core import frames
from neoplanner_tpu.core.types import DroneState

MOTION_DIM = 24


def normalize_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """Scale so the max is 255 (record_planner.py:15 stores uint8 PNG; we keep
    float32 with the same range)."""
    peak = jnp.max(depth, axis=(-2, -1), keepdims=True)
    return depth / jnp.maximum(peak, 1e-6) * 255.0


def motion_vector(drone: DroneState, des_pos_z, plan_init_state: jnp.ndarray,
                  target_state: jnp.ndarray) -> jnp.ndarray:
    """The 24-dim motion input (record_planner.py:17-49):

    [local_vel(3), R row-major(9), body-frame plan-init pos(3)/vel(3),
     body-frame target pos(3)/vel(3)]

    plan_init_state/target_state: (2, 2) [pos_xy; vel_xy]; z is filled with
    des_pos_z for positions and 0 for velocities, then everything is expressed in
    the drone's body frame (positions relative to drone position, velocities
    relative to drone velocity — :30-31, :40-41).
    """
    q = drone.quat
    local_vel = frames.quat_rotate_inv(q, drone.vel)
    rot = frames.quat_to_matrix(q).reshape(drone.vel.shape[:-1] + (9,))

    def lift(state2):
        pos3 = jnp.stack([state2[..., 0, 0], state2[..., 0, 1],
                          jnp.broadcast_to(jnp.asarray(des_pos_z),
                                           state2[..., 0, 0].shape)], axis=-1)
        vel3 = jnp.stack([state2[..., 1, 0], state2[..., 1, 1],
                          jnp.zeros_like(state2[..., 1, 0])], axis=-1)
        return pos3, vel3

    init_pos3, init_vel3 = lift(plan_init_state)
    tgt_pos3, tgt_vel3 = lift(target_state)

    def to_body_pos(p):
        return frames.quat_rotate_inv(q, p - drone.pos)

    def to_body_vel(v):
        return frames.quat_rotate_inv(q, v - drone.vel)

    return jnp.concatenate(
        [local_vel, rot,
         to_body_pos(init_pos3), to_body_vel(init_vel3),
         to_body_pos(tgt_pos3), to_body_vel(tgt_vel3)], axis=-1)


def wpts_to_body(drone: DroneState, des_pos_z, int_wpts: jnp.ndarray
                 ) -> jnp.ndarray:
    """Expert waypoints (D=2, M-1) world -> flattened body-frame 3-D labels
    (3·(M-1),), waypoint-major (form_nn_output, record_planner.py:61-72)."""
    n = int_wpts.shape[-1]
    z = jnp.broadcast_to(jnp.asarray(des_pos_z), int_wpts.shape[:-2] + (1, n))
    w3 = jnp.concatenate([int_wpts, z], axis=-2)          # (..., 3, n)
    rel = w3 - drone.pos[..., :, None]
    local = frames.quat_rotate_inv(drone.quat[..., None, :],
                                   jnp.moveaxis(rel, -1, -2))  # (..., n, 3)
    return local.reshape(local.shape[:-2] + (3 * n,))


def wpts_from_body(drone: DroneState, wpts_local_flat: jnp.ndarray, dims: int
                   ) -> jnp.ndarray:
    """Network output waypoints body -> world, dropping z: (D, M-1)
    (nn_planner.py:104-108, 123-134)."""
    n = wpts_local_flat.shape[-1] // 3
    local = wpts_local_flat.reshape(wpts_local_flat.shape[:-1] + (n, 3))
    world = frames.quat_rotate(drone.quat[..., None, :], local) \
        + drone.pos[..., None, :]
    return jnp.moveaxis(world[..., :dims], -1, -2)        # (..., D, n)


def make_label(drone: DroneState, des_pos_z, int_wpts: jnp.ndarray,
               ts: jnp.ndarray) -> jnp.ndarray:
    """9-dim training label: body-frame waypoints ‖ durations
    (record_planner.py:173, csv columns wpts1_* wpts2_* ts1-3)."""
    return jnp.concatenate([wpts_to_body(drone, des_pos_z, int_wpts), ts],
                           axis=-1)


def flat_input(depth_norm: jnp.ndarray, motion: jnp.ndarray) -> jnp.ndarray:
    """The ONNX-contract flat vector (process_input_np, nn_trainer.py:52-59)."""
    flat_img = depth_norm.reshape(depth_norm.shape[:-2] + (-1,))
    return jnp.concatenate([flat_img, motion], axis=-1)
