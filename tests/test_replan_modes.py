"""Dispatch parity of replan_mode ∈ {global, online, periodic}.

The reference's execute_mission dispatch
(/root/reference/src/planner/scripts/ros_node/traj_planner_node.py:233-245):
global plans exactly once straight to the global goal (global_planning,
:365-374); online replans back-to-back until the goal is reached
(online_planning, :376-388); periodic replans once per period and stops once
the local target is the global goal itself (replan_cb, :421-427).
"""

import jax
import jax.numpy as jnp
import pytest

from neoplanner_tpu.config import (MapParams, MissionParams, PlannerParams,
                                   SimParams, WorldParams)
from neoplanner_tpu.sim import env
from neoplanner_tpu.world import scenegen

pytestmark = pytest.mark.slow

# lean bank + trimmed budget: the dispatch logic under test is identical, and
# each replan_mode is its own (expensive) CPU compile of step_segment
PP = PlannerParams(max_iters=48, retry_num=2, extra_lateral_scales=())
MP = MissionParams()
SP = SimParams()
MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)


@pytest.fixture(scope="module")
def world():
    return scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=10))


def _run(world, goal, mode, n_segments):
    state = env.reset(jax.random.PRNGKey(0), world, jnp.asarray(goal), PP, MP,
                      MAPP)
    step = jax.jit(env.step_segment,
                   static_argnames=("pp", "mp", "sp", "mission_mode",
                                    "replan_mode"))
    infos = []
    for _ in range(n_segments):
        state, info = step(state, PP, MP, SP, "manual", replan_mode=mode)
        infos.append(info)
    return state, infos


def test_global_plans_exactly_once(world):
    """global: one plan, targeted at the global goal, then tracking only."""
    goal = [8.0, 0.0]
    state, infos = _run(world, goal, "global", 12)
    assert int(state.plan_count) == 1
    # the single plan targeted the global goal itself with zero velocity
    first = infos[0]
    assert jnp.allclose(first.target[0], jnp.asarray(goal))
    assert jnp.allclose(first.target[1], 0.0)
    # and the mission still completes on that one trajectory
    assert bool(state.reached)


def test_online_replans_every_segment(world):
    """online: replans every segment even once the local target is the goal."""
    goal = [4.5, 0.0]  # inside longitu_step_dis -> near_goal after plan 1
    n = 3              # too short to reach at v_max = 1 m/s
    state, _ = _run(world, goal, "online", n)
    assert not bool(state.reached)
    assert int(state.plan_count) == n


def test_periodic_stops_replanning_near_goal(world):
    """periodic: the near-goal gate stops replans after the first plan."""
    goal = [4.5, 0.0]
    state, _ = _run(world, goal, "periodic", 3)
    assert not bool(state.reached)
    assert int(state.plan_count) == 1


def test_online_stops_after_reached(world):
    """online keeps replanning only until the goal is reached."""
    goal = [3.0, 0.0]
    state, _ = _run(world, goal, "online", 10)
    assert bool(state.reached)
    assert int(state.plan_count) < 10


def test_default_mode_is_periodic(world):
    goal = [4.5, 0.0]
    s_default = env.reset(jax.random.PRNGKey(0), world, jnp.asarray(goal), PP,
                          MP, MAPP)
    step = jax.jit(env.step_segment,
                   static_argnames=("pp", "mp", "sp", "mission_mode"))
    for _ in range(3):
        s_default, _ = step(s_default, PP, MP, SP, "manual")
    s_periodic, _ = _run(world, goal, "periodic", 3)
    assert int(s_default.plan_count) == int(s_periodic.plan_count) == 1
