"""Mission logic: local-target selection, goal sampling, mission FSM constants.

Vectorized equivalents of:
- local-target selection with lateral obstacle-escape spiral
  (/root/reference/src/planner/scripts/ros_node/traj_planner_node.py:450-488)
- the manager FSM INIT→TAKINGOFF→HOVER→MISSION (manager_node.py:93-98) as per-env
  integer phases
- random/predefined goal sampling (manager_node.py:160-193)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neoplanner_tpu.config import MissionParams, PlannerParams
from neoplanner_tpu.mapping import query

# mission FSM phases (manager_node.py:93 states, minus INIT which is instantaneous)
PHASE_TAKEOFF = 0
PHASE_HOVER = 1
PHASE_MISSION = 2
PHASE_DONE = 3

_ESCAPE_STEPS = 16  # static bound of the reference's unbounded escape while-loop


def set_local_target(pmap, pos2d: jnp.ndarray, goal2d: jnp.ndarray,
                     key: jnp.ndarray, retry_seed: jnp.ndarray,
                     mp: MissionParams, pp: PlannerParams):
    """Pick the receding-horizon local target (traj_planner_node.py:450-488).

    pmap: ESDFMap or SceneMap (any mapping/query backend).
    Returns (target_state (2, 2) = [pos; vel], near_goal ()).
    - within longitu_step_dis of the goal: target = goal, zero velocity, near=True
    - else: longitu_step_dis ahead toward the goal (+N(0,1) noise when
      retry_seed > 0, :469-470), pushed out of occupied space by an alternating,
      growing lateral spiral (:474-477); target velocity = 0.8·v_max toward the
      goal (:480-481).
    """
    diff = goal2d - pos2d
    dist = jnp.linalg.norm(diff)
    near = dist < mp.longitu_step_dis
    longi = diff / jnp.maximum(dist, 1e-9)
    lat = jnp.stack([longi[1], -longi[0]])

    base = pos2d + mp.longitu_step_dis * longi
    noise = jax.random.normal(key, (2,)) * (retry_seed > 0)
    lt = base + noise

    def escape(i, carry):
        lt, flag, move = carry
        blocked = query.has_collision(pmap, lt, pp.safe_dis)
        direction = jnp.where(flag == 0, 1.0, -1.0)
        lt = jnp.where(blocked, lt + direction * move * lat, lt)
        flag = jnp.where(blocked, 1 - flag, flag)
        move = jnp.where(blocked, move + mp.lateral_step_length, move)
        return lt, flag, move

    lt, _, _ = jax.lax.fori_loop(
        0, _ESCAPE_STEPS, escape,
        (lt, jnp.zeros((), jnp.int32), jnp.asarray(mp.lateral_step_length)))

    goal_dir = (goal2d - lt) / jnp.maximum(jnp.linalg.norm(goal2d - lt), 1e-9)
    tvel = mp.move_vel_frac * pp.v_max * goal_dir

    target_pos = jnp.where(near, goal2d, lt)
    target_vel = jnp.where(near, jnp.zeros(2), tvel)
    return jnp.stack([target_pos, target_vel]), near


FSM_DOT = """digraph mission_fsm {
  rankdir=LR;
  INIT -> TAKINGOFF [label="launch"];
  TAKINGOFF -> HOVER [label="reach_height"];
  HOVER -> MISSION [label="set_goal"];
  MISSION -> MISSION [label="set_goal"];
  MISSION -> HOVER [label="reach_goal"];
}
"""


def save_fsm_graph(path: str) -> str:
    """Write the mission FSM as Graphviz DOT (the manager's draw_fsm_graph PDF
    export, manager_node.py:315-316, without the graphviz binary dependency)."""
    with open(path, "w") as f:
        f.write(FSM_DOT)
    return path


def sample_random_goal(key: jnp.ndarray, flap: jnp.ndarray):
    """The data-collection goal sampler (manager_node.py:179-193): x flips between
    -1 and 26 each mission, y ~ 4·(U[0,1) - 0.6). Returns (goal2d, next_flap)."""
    y = 4.0 * (jax.random.uniform(key) - 0.6)
    x = jnp.where(flap == 0, -1.0, 26.0)
    return jnp.stack([x, y]), 1 - flap


def sample_clear_goal(key: jnp.ndarray, flap: jnp.ndarray, pmap,
                      clear_dis: float):
    """sample_random_goal, nudged to the nearest clear spot when it lands
    within ``clear_dis`` of an obstacle (same ring search as the sweep
    harness, examples/multi_run.py): the reference's sampler drops ~24% of
    far-leg goals inside safe_dis (BASELINE.md round 2), where any planner —
    the reference's included — correctly refuses; vetting goals against the
    ground-truth map separates goal-placement failures from planner failures.
    clear_dis <= 0 keeps the raw reference sampler."""
    goal, flap = sample_random_goal(key, flap)
    if clear_dis <= 0.0:
        return goal, flap
    rs = jnp.arange(0.0, 4.1, 0.5)
    angs = jnp.linspace(0.0, 2.0 * jnp.pi, 8, endpoint=False)
    offs = jnp.stack([rs[:, None] * jnp.cos(angs)[None, :],
                      rs[:, None] * jnp.sin(angs)[None, :]],
                     axis=-1).reshape(-1, 2)            # (72, 2), r-major
    cand = goal[None, :] + offs
    dis, _ = query.distance(pmap, cand)
    ok = dis > clear_dis
    idx = jnp.argmax(ok)                                # first clear candidate
    return jnp.where(jnp.any(ok), cand[idx], goal), flap
