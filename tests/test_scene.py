"""Analytic scene map vs grid ESDF, and the scene-backed closed loop."""

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu.config import (MapParams, MissionParams, PlannerParams,
                                   SimParams, WorldParams)
from neoplanner_tpu.mapping import esdf, scene
from neoplanner_tpu.sim import env
from neoplanner_tpu.world import scenegen, voxelize

MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)


def test_scene_sdf_matches_grid_esdf_outside(rng):
    """Outside obstacles, the analytic footprint SDF matches the rasterized EDT
    to grid-quantization accuracy."""
    world = scenegen.generate(jax.random.PRNGKey(3), WorldParams(num_boxes=8))
    sc = scene.build(world, MAPP)
    occ = voxelize.occupancy_2d(world, MAPP)
    emap = esdf.build(occ, jnp.array([MAPP.origin_x, MAPP.origin_y]),
                      MAPP.resolution)
    pts = rng.uniform([-3, -9], [20, 9], size=(300, 2)).astype(np.float32)
    d_scene, g_scene = scene.sample(sc, jnp.array(pts))
    d_grid, _ = esdf.sample_bilinear(emap, jnp.array(pts))
    d_scene = np.asarray(d_scene)
    d_grid = np.asarray(d_grid)
    sel = d_scene > 0.3  # away from surfaces, where rasterization error is small
    assert sel.sum() > 100
    diff = np.abs(d_scene[sel] - d_grid[sel])
    assert np.median(diff) < 0.1
    assert np.quantile(diff, 0.95) < 0.25
    # gradients normalized
    gn = np.linalg.norm(np.asarray(g_scene), axis=-1)
    assert np.all(gn[sel] < 1.001)


def test_scene_signed_inside():
    """Inside an obstacle the scene SDF goes negative with a nonzero gradient
    (the grid EDT is flat zero there)."""
    world = scenegen.generate(jax.random.PRNGKey(3), WorldParams(num_boxes=8))
    sc = scene.build(world, MAPP)
    c = np.asarray(world.centers)[np.asarray(world.active)][0]
    p = jnp.array(c[:2])
    d, g = scene.sample(sc, p)
    assert float(d) < 0
    gg = jax.grad(lambda q: scene.sample(sc, q)[0])(p + 0.05)
    assert np.linalg.norm(np.asarray(gg)) > 0.5


def test_scene_autodiff_matches_fd(rng):
    world = scenegen.generate(jax.random.PRNGKey(3), WorldParams(num_boxes=8))
    sc = scene.build(world, MAPP)
    f = lambda q: scene.sample(sc, q)[0]
    for _ in range(5):
        p = jnp.array(rng.uniform([-2, -8], [18, 8], size=2).astype(np.float32))
        if abs(float(f(p))) < 0.05:
            continue  # surface kink
        g = jax.grad(f)(p)
        eps = 1e-3
        for d in range(2):
            e = jnp.zeros(2).at[d].set(eps)
            fd = (f(p + e) - f(p - e)) / (2 * eps)
            assert abs(float(g[d]) - float(fd)) < 2e-2


def test_closed_loop_scene_backend():
    """plan_map='scene' flies the same mission, collision-free."""
    pp = PlannerParams(max_iters=96)
    mp, sp = MissionParams(), SimParams()
    world = scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=10))
    state = env.reset(jax.random.PRNGKey(0), world, jnp.array([12.0, 0.0]),
                      pp, mp, MAPP)
    step = jax.jit(env.step_segment, static_argnames=(
        "pp", "mp", "sp", "mission_mode", "sensing", "mapp", "cam", "planner",
        "np_cfg", "plan_map"))
    for _ in range(30):
        state, _ = step(state, pp, mp, sp, "manual", "gt", None, None,
                        "expert", None, None, "scene")
        if bool(state.reached):
            break
    assert bool(state.reached)
    assert float(state.metrics[2]) < 1e-3  # no collision along the flight
