"""Moving-target tracking (BASELINE.json config 4)."""

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu.config import (MapParams, MissionParams, PlannerParams,
                                   SimParams, WorldParams)
from neoplanner_tpu.sim import env, tracker
from neoplanner_tpu.world import scenegen

PP = PlannerParams(max_iters=64)
MP = MissionParams()
SP = SimParams()
MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)


def test_tracks_moving_target():
    world = scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=8))
    state = env.reset(jax.random.PRNGKey(0), world,
                      jnp.array([9.0, 5.5]), PP, MP, MAPP,
                      start_pos=jnp.array([9.0, 5.5]))
    # slow circular target around (9, 5.5): every point of this circle has
    # ~3 m clearance in this world (checked against the scene SDF); the start
    # point also needs > safe_dis clearance or the pinned-boundary collision
    # cost rejects every plan (as it would in the reference)
    targets = tracker.circular_target_path(
        30, jnp.array([9.0, 5.5]), 2.5, 0.25, MP.replan_period)
    roll = jax.jit(tracker.track_rollout,
                   static_argnames=("pp", "mp", "sp", "plan_map"))
    final, path = roll(state, targets, PP, MP, SP, plan_map="scene")
    path = np.asarray(path)
    targets = np.asarray(targets)
    # after convergence, the drone stays within a few meters of the target
    errs = np.linalg.norm(path[10:, :2] - targets[10:], axis=-1)
    assert np.median(errs) < 2.0, errs
    # it keeps replanning every segment (no termination)
    assert int(final.plan_count) == len(targets)
    # and never collides
    assert float(final.metrics[2]) < 1e-3
