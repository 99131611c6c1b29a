"""In-kernel tracking segment (sim/track_pallas.py) vs the XLA scan.

Both sides implement sim/env._track_segment's exact semantics (cascaded
controller + flatness attitude + 10 Hz metric + reach/freeze logic), so
everything must match to f32 roundoff."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from neoplanner_tpu.config import (MapParams, MissionParams, PlannerParams,
                                   SimParams, WorldParams)
from neoplanner_tpu.sim import env, missions, track_pallas
from neoplanner_tpu.world import scenegen

pytestmark = pytest.mark.slow

MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
PP = PlannerParams()
MP = MissionParams()
SP = SimParams()


def _states(n=4, goal=(20.0, 0.0)):
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), n,
                                     WorldParams(num_boxes=8))
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    return jax.vmap(lambda k, w: env.reset(
        k, w, jnp.array(goal), PP, MP, MAPP, plan_map="scene"))(keys, worlds)


def _cmds(n, spr=60):
    """Smooth synthetic setpoint stream: straight-ish path with lateral sway,
    consistent pos/vel/acc derivatives (what a MINCO plan would emit)."""
    t = jnp.arange(spr) / MP.cmd_hz
    def one(i):
        v = 0.8 + 0.05 * i
        a = 0.4
        w = 2.0 + 0.3 * i
        px = v * t
        py = a * jnp.sin(w * t)
        vx = jnp.full_like(t, v)
        vy = a * w * jnp.cos(w * t)
        ax = jnp.zeros_like(t)
        ay = -a * w * w * jnp.sin(w * t)
        return jnp.stack([jnp.stack([px, py], -1), jnp.stack([vx, vy], -1),
                          jnp.stack([ax, ay], -1)], axis=1)   # (spr, 3, 2)
    return jnp.stack([one(i) for i in range(n)])


def _run_both(states, cmds, i0=0):
    want = jax.vmap(lambda s, c: env._track_segment(
        s, c, PP, MP, SP, "scene", i0=i0))(states, cmds)
    got = jax.vmap(lambda s, c: track_pallas.track_segment(
        s, c, PP, MP, SP, i0=i0, interpret=True))(states, cmds)
    return want, got


def _assert_match(want, got):
    wd, wreach, wsteps, wmet, wmpos, wtrace = want
    gd, greach, gsteps, gmet, gmpos, gtrace = got
    np.testing.assert_allclose(np.asarray(gd.pos), np.asarray(wd.pos),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd.vel), np.asarray(wd.vel),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd.quat), np.asarray(wd.quat),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd.yaw), np.asarray(wd.yaw),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(greach), np.asarray(wreach))
    assert np.array_equal(np.asarray(gsteps), np.asarray(wsteps))
    np.testing.assert_allclose(np.asarray(gmet), np.asarray(wmet),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gmpos), np.asarray(wmpos),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gtrace), np.asarray(wtrace),
                               rtol=1e-5, atol=1e-5)


def test_tracking_segment_matches_xla():
    states = _states()
    cmds = _cmds(4)
    want, got = _run_both(states, cmds)
    _assert_match(want, got)


def test_metric_offset_and_reached_freeze():
    # goal placed on the path so some envs reach mid-segment and freeze;
    # i0 offsets the 10 Hz cadence like the chunked (sensor-rate) caller
    states = _states(goal=(0.55, 0.0))
    cmds = _cmds(4)
    want, got = _run_both(states, cmds, i0=30)
    _assert_match(want, got)
    assert bool(np.asarray(want[1]).any()), "test should exercise reach"


def test_non_mission_phase_holds():
    states = _states()
    states = states.replace(phase=jnp.full_like(states.phase,
                                                missions.PHASE_DONE))
    cmds = _cmds(4)
    want, got = _run_both(states, cmds)
    _assert_match(want, got)
    np.testing.assert_allclose(np.asarray(got[0].pos),
                               np.asarray(states.drone.pos), atol=1e-6)


def _grid_states(n=4, goal=(20.0, 0.0)):
    """Depth-mode reset: per-env sensed grids (the vision tracker's input)."""
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6,
                     edt_truncation=2.0)
    from neoplanner_tpu.config import CameraParams
    cam = CameraParams(width=64, height=48)
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), n,
                                     WorldParams(num_boxes=8))
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    states = jax.vmap(lambda k, w: env.reset(
        k, w, jnp.array(goal), PP, MP, mapp, sensing="depth"))(keys, worlds)
    # fuse one frame + rebuild so the ESDF is a real sensed field
    states = jax.vmap(lambda s: env.sense_and_map(s, mapp, cam))(states)
    return states


def _run_both_grid(states, cmds, i0=0):
    want = jax.vmap(lambda s, c: env._track_segment(
        s, c, PP, MP, SP, "grid", i0=i0))(states, cmds)
    got = jax.vmap(lambda s, c: track_pallas.track_segment_grid(
        s, c, PP, MP, SP, i0=i0, interpret=True))(states, cmds)
    return want, got


def test_grid_tracking_segment_matches_xla():
    """The grid-metric variant (kernel without a distance query + outside
    ESDF taps at the exported tick positions) equals the XLA scan exactly."""
    # ground-truth rasterized grid (not the sensed one: a parked drone only
    # violates on cells the map actually knows about)
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), 4,
                                     WorldParams(num_boxes=8))
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    states = jax.vmap(lambda k, w: env.reset(
        k, w, jnp.array([20.0, 0.0]), PP, MP, mapp,
        plan_map="grid"))(keys, worlds)
    # park each env right next to its first obstacle so the collision term
    # of the 10 Hz metric actually fires (holding position keeps the drone
    # inside the safe_dis ring all segment)
    near = states.world.centers[:, 0, :2] \
        + states.world.half_sizes[:, 0, :2] + 0.15
    drone = states.drone.replace(
        pos=jnp.concatenate([near, states.drone.pos[:, 2:]], axis=1))
    states = states.replace(drone=drone)
    cmds = jnp.broadcast_to(
        jnp.stack([near, jnp.zeros_like(near), jnp.zeros_like(near)],
                  axis=1)[:, None], (4, 60, 3, 2))
    want, got = _run_both_grid(states, cmds)
    _assert_match(want, got)
    # the collision term must actually fire somewhere, or the test is vacuous
    assert float(np.asarray(want[3])[:, 2].max()) > 0.0


def test_grid_tracking_reached_freeze_and_offset():
    states = _grid_states(goal=(0.55, 0.0))
    cmds = _cmds(4)
    want, got = _run_both_grid(states, cmds, i0=30)
    _assert_match(want, got)
    assert bool(np.asarray(want[1]).any()), "test should exercise reach"
