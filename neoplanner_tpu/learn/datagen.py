"""Batched expert-demonstration collection.

Replaces the reference's record pipeline — one Gazebo instance flying random
missions with RecordPlanner appending CSV rows + PNG depth images
(/root/reference/src/planner/scripts/traj_planner/record_planner.py:136-185,
driven by manager random goals, README.md:151-166) — with vmapped closed-loop
rollouts: every env contributes one (depth, motion, label) sample per successful
replan, thousands of envs at once. This is BASELINE.json config 5.

The device side returns dense arrays + validity masks; ``export_csv`` writes the
reference's exact 34-column train.csv + PNG layout so the reference's own trainer
could consume our data (and vice versa).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu.config import (CameraParams, MapParams, MissionParams,
                                   PlannerParams, SimParams, WorldParams)
from neoplanner_tpu.learn import data
from neoplanner_tpu.sense import raycast
from neoplanner_tpu.sim import env
from neoplanner_tpu.world import scenegen

CSV_HEADER = (
    "id,drone_vel_x,drone_vel_y,drone_vel_z,"
    "R11,R12,R13,R21,R22,R23,R31,R32,R33,"
    "init_pos_x,init_pos_y,init_pos_z,init_vel_x,init_vel_y,init_vel_z,"
    "target_pos_x,target_pos_y,target_pos_z,target_vel_x,target_vel_y,"
    "target_vel_z,wpts1_x,wpts1_y,wpts1_z,wpts2_x,wpts2_y,wpts2_z,ts1,ts2,ts3"
)  # record_planner.py:95-129


def record_rollout(state: env.EnvState, num_segments: int, pp: PlannerParams,
                   mp: MissionParams, sp: SimParams, cam: CameraParams,
                   des_pos_z: float, plan_map: str = "scene"):
    """Roll one env for num_segments, emitting a sample per segment.

    Returns (final_state, depths (S, h, w), motions (S, 24), labels (S, 9),
    valid (S,)). The depth frame is rendered at the drone pose at record time —
    the reference records the live camera frame while planning on the global map
    (record mode runs under sim_global.launch, README.md:151-162), which is
    exactly 'gt' sensing here.
    """
    def body(s, _):
        depth = raycast.render_depth_auto(s.world, s.drone.pos, s.drone.quat, cam)
        s2, info = env.step_segment(s, pp, mp, sp, mission_mode="random",
                                    plan_map=plan_map)
        motion = data.motion_vector(info.drone, des_pos_z, info.plan_init,
                                    info.target)
        label = data.make_label(info.drone, des_pos_z, info.int_wpts, info.ts)
        return s2, (data.normalize_depth(depth), motion, label, info.ok)

    final, (depths, motions, labels, valid) = jax.lax.scan(
        body, state, None, length=num_segments)
    return final, depths, motions, labels, valid


def collect(key: jnp.ndarray, num_envs: int, num_segments: int,
            pp: PlannerParams, mp: MissionParams, sp: SimParams,
            mapp: MapParams, cam: CameraParams, wp: WorldParams):
    """Full datagen: random worlds -> batched record rollouts -> flat arrays.

    Returns (inputs_img (N, h, w), motions (N, 24), labels (N, 9)) with invalid
    samples already filtered on host.
    """
    k_world, k_reset, k_roll = jax.random.split(key, 3)
    worlds = scenegen.generate_batch(k_world, num_envs, wp)
    reset_keys = jax.random.split(k_reset, num_envs)

    reset_b = jax.vmap(lambda k, w: env.reset(k, w, None, pp, mp, mapp))
    states = reset_b(reset_keys, worlds)

    roll = jax.jit(jax.vmap(
        lambda s: record_rollout(s, num_segments, pp, mp, sp, cam,
                                 mp.des_pos_z)),
        static_argnames=())
    _, depths, motions, labels, valid = roll(states)

    v = np.asarray(valid).reshape(-1)
    flat = lambda x: np.asarray(x).reshape((-1,) + x.shape[2:])[v]
    return flat(depths), flat(motions), flat(labels)


def export_csv(out_dir: str, depths: np.ndarray, motions: np.ndarray,
               labels: np.ndarray, start_id: int = 0) -> str:
    """Write the reference's training_data layout: train.csv + depth_img/<id>.png
    (record_planner.py:152-185). Needs PIL only at call time."""
    from PIL import Image

    img_dir = os.path.join(out_dir, "depth_img")
    os.makedirs(img_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "train.csv")
    fresh = not os.path.isfile(csv_path)
    with open(csv_path, "a") as f:
        if fresh:
            f.write(CSV_HEADER + "\n")
        for i in range(len(depths)):
            sample_id = start_id + i
            row = np.concatenate([motions[i], labels[i]])
            f.write(f"t{sample_id}," + ",".join(f"{x:.6f}" for x in row) + "\n")
            Image.fromarray(depths[i].astype(np.uint8), mode="L").save(
                os.path.join(img_dir, f"{sample_id}.png"))
    return csv_path


def load_csv(out_dir: str, cam: CameraParams):
    """Read a reference-format training_data directory back into arrays."""
    from PIL import Image

    csv_path = os.path.join(out_dir, "train.csv")
    depths, motions, labels = [], [], []
    with open(csv_path) as f:
        header = f.readline()
        assert header.strip() == CSV_HEADER
        for line in f:
            parts = line.strip().split(",")
            sample_id = parts[0][1:]
            img_path = os.path.join(out_dir, "depth_img", f"{sample_id}.png")
            if not os.path.isfile(img_path):
                continue
            img = np.asarray(Image.open(img_path), dtype=np.float32)
            vals = np.array([float(x) for x in parts[1:]], dtype=np.float32)
            depths.append(img)
            motions.append(vals[:24])
            labels.append(vals[24:])
    return (np.stack(depths), np.stack(motions), np.stack(labels))
