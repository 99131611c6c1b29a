"""Aux subsystems: metrics records, tracking CSV, profiling, FSM export."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu.config import (MapParams, MissionParams, PlannerParams,
                                   SimParams, WorldParams)
from neoplanner_tpu.sim import env, missions
from neoplanner_tpu.utils import metrics, profiling
from neoplanner_tpu.world import scenegen

PP = PlannerParams(max_iters=48)
MP = MissionParams()
SP = SimParams()
MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)


def test_segment_trace_and_tracking_csv(tmp_path):
    world = scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=8))
    state = env.reset(jax.random.PRNGKey(0), world, jnp.array([8.0, 0.0]),
                      PP, MP, MAPP)
    traces = []
    step = jax.jit(env.step_segment, static_argnames=(
        "pp", "mp", "sp", "mission_mode", "plan_map"))
    for _ in range(4):
        state, info = step(state, PP, MP, SP, "manual", plan_map="scene")
        traces.append(np.asarray(info.trace))
    traces = np.concatenate(traces)
    assert traces.shape == (4 * MP.steps_per_replan, 5, 3)
    # tracking error within bounds after the first settling segment
    err = np.linalg.norm(traces[60:, 0, :2] - traces[60:, 2, :2], axis=-1)
    assert np.median(err) < 0.4

    path = metrics.save_tracking_csv(str(tmp_path / "track.csv"), traces)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == len(traces) + 1
    assert lines[0].startswith("time,global_pos_x")


def test_mission_records_roundtrip(tmp_path):
    world = scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=8))
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    goals = jnp.tile(jnp.array([[8.0, 0.0]]), (4, 1))
    states = jax.vmap(lambda k, g: env.reset(k, world, g, PP, MP, MAPP))(
        keys, goals)
    out = jax.jit(jax.vmap(lambda s: env.rollout(
        s, 12, PP, MP, SP, "manual", plan_map="scene")))(states)
    recs = metrics.from_env_states(out, "poles", 8, "expert", 0.05)
    assert len(recs) == 4
    path = str(tmp_path / "planning_metrics.txt")
    metrics.write_metrics_file(path, recs)
    back = metrics.read_metrics_file(path)
    assert len(back) == 4
    assert back[0].planner == "expert"
    agg = metrics.analyze(back)
    assert "expert" in agg and "poles" in agg["expert"]
    assert 0.0 <= agg["expert"]["poles"]["success_rate"] <= 1.0


def test_profiling_helpers(tmp_path):
    timer = profiling.StageTimer()
    x = jnp.ones(128)
    with timer("square", block_on=x):
        y = x * x
    assert "square" in timer.report()

    profiling.check_finite({"a": jnp.ones(3)})
    try:
        profiling.check_finite({"a": jnp.array([1.0, jnp.nan])})
        raised = False
    except FloatingPointError:
        raised = True
    assert raised

    p = missions.save_fsm_graph(str(tmp_path / "fsm.dot"))
    assert "TAKINGOFF" in open(p).read()
