"""Object-tracking mission: continuous replanning toward a moving target.

Re-design of the reference's tracker pair
(/root/reference/src/planner/scripts/ros_node/tracker_planner_node.py:284-295 —
an endless ``while True: try_local_planning()`` toward whatever
/move_base_simple/goal last said — and tracker_manager_node.py, which only
handles takeoff). Here the moving target is an explicit per-segment array and
the no-termination semantics are expressed by clearing the mission-done flags
each segment; everything else reuses the closed-loop machinery.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from neoplanner_tpu.config import (CameraParams, MapParams, MissionParams,
                                   PlannerParams, SimParams)
from neoplanner_tpu.sim import env


def track_segment(state: env.EnvState, target: jnp.ndarray, pp: PlannerParams,
                  mp: MissionParams, sp: SimParams, sensing: str = "gt",
                  mapp: Optional[MapParams] = None,
                  cam: Optional[CameraParams] = None,
                  planner: str = "expert", net_vars=None, np_cfg=None,
                  plan_map: str = "grid"):
    """One replan period chasing the current target position.

    The tracker never terminates (tracker_planner_node.py:284-295: no
    goal-reached check, no timeout): reached/near/failed state is cleared before
    each segment so replanning continues as the target moves.
    """
    # fail_count is left alone: consecutive failures keep escalating the
    # local-target noise (the reference's retry ladder) without terminating
    state = state.replace(goal=target,
                          reached=jnp.asarray(False),
                          near_goal=jnp.asarray(False),
                          failed=jnp.asarray(False),
                          steps=jnp.zeros((), jnp.int32),
                          phase=jnp.asarray(env.missions.PHASE_MISSION,
                                            jnp.int32))
    return env.step_segment(state, pp, mp, sp, "manual", sensing, mapp, cam,
                            planner, net_vars, np_cfg, plan_map)


def track_segment_stream(state: env.EnvState, targets: jnp.ndarray,
                         pp: PlannerParams, mp: MissionParams, sp: SimParams,
                         sensing: str = "gt",
                         mapp: Optional[MapParams] = None,
                         cam: Optional[CameraParams] = None,
                         planner: str = "expert", net_vars=None, np_cfg=None,
                         plan_map: str = "grid"):
    """One replan period with C mid-segment target updates: targets (C, 2).

    Models the reference's asynchronous goal topic
    (tracker_planner_node.py:160-162, 284-295): the replan consumes the
    *latest stored* target (whatever the previous segment's final update
    left in state.goal — message-arrival semantics rather than
    period-boundary quantization), and the stored goal advances chunk by
    chunk through the segment so the next replan starts from the freshest
    observation."""
    state = state.replace(reached=jnp.asarray(False),
                          near_goal=jnp.asarray(False),
                          failed=jnp.asarray(False),
                          steps=jnp.zeros((), jnp.int32),
                          phase=jnp.asarray(env.missions.PHASE_MISSION,
                                            jnp.int32))
    return env.step_segment(state, pp, mp, sp, "manual", sensing, mapp, cam,
                            planner, net_vars, np_cfg, plan_map,
                            goal_stream=targets)


def track_rollout(state: env.EnvState, targets: jnp.ndarray, pp: PlannerParams,
                  mp: MissionParams, sp: SimParams, **kwargs):
    """Chase a per-segment target path: targets (S, 2). Returns (final state,
    drone positions (S, 3) at segment ends)."""
    def body(s, tgt):
        s2, _ = track_segment(s, tgt, pp, mp, sp, **kwargs)
        return s2, s2.drone.pos
    return jax.lax.scan(body, state, targets)


def circular_target_path(num_segments: int, center: jnp.ndarray, radius: float,
                         angular_rate: float, replan_period: float
                         ) -> jnp.ndarray:
    """A smooth moving-target path for tracking demos/benchmarks: (S, 2)."""
    t = jnp.arange(num_segments) * replan_period
    ang = angular_rate * t
    return center[None, :] + radius * jnp.stack(
        [jnp.cos(ang), jnp.sin(ang)], axis=-1)
