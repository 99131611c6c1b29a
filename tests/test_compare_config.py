"""Instrumented planning harnesses, YAML config loading, env snapshots."""

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu import config as config_mod
from neoplanner_tpu.config import (MapParams, MissionParams, PlannerParams,
                                   SimParams, WorldParams)
from neoplanner_tpu.plan import compare
from neoplanner_tpu.sim import env
from neoplanner_tpu.utils import snapshot
from neoplanner_tpu.world import scenegen
from tests.test_expert import make_world, mission

REF_YAML = "/root/reference/src/planner/launch/config/planner_config.yaml"


def test_plan_with_attempts():
    pp = PlannerParams(max_iters=64)
    emap = make_world(blocking=True)
    head, tail = mission(pp)
    att = jax.jit(compare.plan_with_attempts, static_argnames="pp")(
        emap, head, tail, jax.random.PRNGKey(1), pp)
    L = 3 + len(pp.extra_lateral_scales) + pp.retry_num
    assert att.int_wpts.shape == (L, 2, 2)
    assert bool(jnp.any(att.ok))
    picked = int(att.picked)
    assert bool(att.ok[picked])
    # the picked lane is the cheapest feasible among the primary lanes when any
    ok_primary = np.asarray(att.ok[: pp.batch_num])
    if ok_primary.any():
        totals = np.asarray(att.total[: pp.batch_num])
        assert picked == int(np.argmin(np.where(ok_primary, totals, np.inf)))


def test_compare_nn_vs_refined():
    from neoplanner_tpu.config import CameraParams, NetParams
    from neoplanner_tpu.learn import train
    from neoplanner_tpu.sense import raycast

    cam = CameraParams(width=64, height=48)
    netp = NetParams(img_width=64, img_height=48, backbone="smallconv")
    pp = PlannerParams(max_iters=64)
    variables = train.init_params(jax.random.PRNGKey(0), netp)

    emap = make_world(blocking=True)
    world = scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=8))
    from neoplanner_tpu.core import frames
    from neoplanner_tpu.core.types import DroneState
    drone = DroneState(pos=jnp.array([0.0, 0.0, 2.0]), vel=jnp.zeros(3),
                       quat=frames.quat_identity(), yaw=jnp.zeros(()))
    depth = raycast.render_depth(world, drone.pos, drone.quat, cam)
    plan_init = jnp.array([[0.0, 0.0], [0.5, 0.0]])
    target = jnp.array([[8.0, 0.0], [0.8, 0.0]])

    cmp = compare.compare_nn_vs_refined(emap, variables, netp, depth, drone,
                                        2.0, plan_init, target,
                                        jax.random.PRNGKey(2), pp)
    assert bool(cmp.refined.ok)
    assert float(cmp.output_mse) >= 0
    # refinement never worsens the weighted cost vs the raw (untrained) net
    from neoplanner_tpu.plan import costs
    w = np.asarray(costs.weights(pp))
    assert float(np.asarray(cmp.refined.costs) @ w) <= \
        float(np.asarray(cmp.nn_costs) @ w) + 1e-3


def test_load_reference_yaml():
    pp, mp = config_mod.load_yaml(REF_YAML)
    # deployed values (planner_config.yaml:1-24)
    assert pp.v_max == 1.0
    assert pp.t_min == 0.5 and pp.t_max == 5.0
    assert pp.safe_dis == 0.7
    assert pp.w_collision == 10000
    assert pp.num_pieces == 3
    assert pp.collision_cost_tol == 5
    assert mp.cmd_hz == 60
    assert mp.replan_period == 1.0
    assert mp.des_pos_z == 2.0
    assert mp.hover_height == 2.0


def test_env_snapshot_roundtrip(tmp_path):
    pp = PlannerParams(max_iters=16)
    mp, sp = MissionParams(), SimParams()
    mapp = MapParams(width=128, height=96, origin_x=-2.0, origin_y=-4.8)
    world = scenegen.generate(jax.random.PRNGKey(0), WorldParams(num_boxes=6))
    state = env.reset(jax.random.PRNGKey(1), world, jnp.array([6.0, 0.0]),
                      pp, mp, mapp)
    state, _ = env.step_segment(state, pp, mp, sp, plan_map="scene")

    path = snapshot.save(str(tmp_path / "env_snap"), state)
    template = env.reset(jax.random.PRNGKey(2), world, jnp.array([0.0, 0.0]),
                         pp, mp, mapp)
    restored = snapshot.load(path, template)
    np.testing.assert_allclose(np.asarray(restored.drone.pos),
                               np.asarray(state.drone.pos))
    assert int(restored.plan_count) == int(state.plan_count)
    # restored state continues stepping
    restored, _ = env.step_segment(restored, pp, mp, sp, plan_map="scene")
    assert np.all(np.isfinite(np.asarray(restored.drone.pos)))
