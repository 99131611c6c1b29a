"""Closed-loop navigation: reset -> segments -> goal reached, metrics sane."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoplanner_tpu.config import (MapParams, MissionParams, PlannerParams,
                                   SimParams, WorldParams)
from neoplanner_tpu.sim import env, missions
from neoplanner_tpu.world import scenegen

pytestmark = pytest.mark.slow

PP = PlannerParams(max_iters=96)  # trimmed optimizer budget keeps CPU tests fast
MP = MissionParams()
SP = SimParams()
MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)


@pytest.fixture(scope="module")
def world():
    return scenegen.generate(jax.random.PRNGKey(7), WorldParams(num_boxes=10))


def test_reach_goal_closed_loop(world):
    goal = jnp.array([12.0, 0.0])
    state = env.reset(jax.random.PRNGKey(0), world, goal, PP, MP, MAPP)
    step = jax.jit(env.step_segment, static_argnames=("pp", "mp", "sp",
                                                      "mission_mode"))
    for _ in range(30):
        state, _ = step(state, PP, MP, SP, "manual")
        if bool(state.reached):
            break
    assert bool(state.reached), (float(state.steps), bool(state.failed))
    # reached within the 45 s cap
    assert float(state.steps) / MP.cmd_hz < MP.max_target_find_time
    # drone physically at the goal
    assert float(jnp.linalg.norm(state.drone.pos[:2] - goal)) < 2 * \
        MP.target_reach_threshold
    # closed-loop weighted metric is finite and small (no collisions)
    wm = float(env.weighted_metric(state))
    assert wm < 10 * PP.collision_cost_tol  # the mission-failure bar (:359-362)
    assert int(state.plan_count) >= 2       # receding-horizon actually replanned
    assert int(state.iter_sum) > 0


def test_rollout_scan_matches_python_loop(world):
    goal = jnp.array([8.0, 1.0])
    s0 = env.reset(jax.random.PRNGKey(1), world, goal, PP, MP, MAPP)
    out_scan = jax.jit(env.rollout, static_argnames=(
        "num_segments", "pp", "mp", "sp", "mission_mode"))(
            s0, 5, PP, MP, SP, "manual")
    s = s0
    for _ in range(5):
        s, _ = env.step_segment(s, PP, MP, SP, "manual")
    # jit fusion reassociates f32 arithmetic; tiny cost differences pick different
    # L-BFGS line-search branches, so trajectories agree only to cm level
    np.testing.assert_allclose(np.asarray(out_scan.drone.pos),
                               np.asarray(s.drone.pos), atol=0.05)
    assert int(out_scan.plan_count) == int(s.plan_count)


def test_batched_envs(world):
    """vmap over envs with different goals — the scaling axis."""
    # goals verified > safe_dis clear of obstacles in this world (a goal inside an
    # obstacle correctly fails the mission, as in the reference)
    goals = jnp.array([[10.0, 0.0], [6.0, 2.0], [8.0, 3.0], [5.0, -3.0]])
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    reset_b = jax.vmap(lambda k, g: env.reset(k, world, g, PP, MP, MAPP))
    states = reset_b(keys, goals)
    roll = jax.jit(jax.vmap(
        lambda s: env.rollout(s, 12, PP, MP, SP, "manual")))
    out = roll(states)
    assert out.drone.pos.shape == (4, 3)
    reached = np.asarray(out.reached)
    assert reached.sum() >= 3, reached  # most goals reachable in 12 s


def test_tracking_error_bounded(world):
    """The cascaded controller tracks the planned setpoints closely."""
    goal = jnp.array([10.0, 0.0])
    state = env.reset(jax.random.PRNGKey(3), world, goal, PP, MP, MAPP)
    step = jax.jit(env.step_segment, static_argnames=("pp", "mp", "sp",
                                                      "mission_mode"))
    errs = []
    for _ in range(8):
        des0 = np.asarray(state.buffer[0, 0])    # setpoint about to be tracked
        state, _ = step(state, PP, MP, SP, "manual")
        desN = np.asarray(state.buffer[0, 0])
        errs.append(np.linalg.norm(np.asarray(state.drone.pos[:2]) - desN))
        if bool(state.reached):
            break
    assert np.median(errs) < 0.35, errs  # tracking error well under safe_dis


def test_takeoff_phase(world):
    goal = jnp.array([6.0, 0.0])
    state = env.reset(jax.random.PRNGKey(4), world, goal, PP, MP, MAPP,
                      skip_takeoff=False)
    assert int(state.phase) == missions.PHASE_TAKEOFF
    step = jax.jit(env.step_segment, static_argnames=("pp", "mp", "sp",
                                                      "mission_mode"))
    for _ in range(20):
        state, _ = step(state, PP, MP, SP, "manual")
        if bool(state.reached):
            break
    assert float(state.drone.pos[2]) > MP.hover_height - 0.3
    assert bool(state.reached)


def test_random_mission_mode(world):
    """Random goal mode keeps generating missions (the datagen driver)."""
    state = env.reset(jax.random.PRNGKey(5), world, None, PP, MP, MAPP)
    step = jax.jit(env.step_segment, static_argnames=("pp", "mp", "sp",
                                                      "mission_mode"))
    for _ in range(40):
        state, _ = step(state, PP, MP, SP, "random")
    assert int(state.missions_done) >= 1


def test_predefined_mission_mode(world):
    """Predefined goal-tour mode (manager_node.py:153-166,
    manager_config.yaml:2-3): reset arms the tour, missions dispatch the
    entries in order, and the env parks at PHASE_DONE when the tour ends."""
    tour = jnp.array([[6.0, 0.0], [10.0, 0.0], [5.0, -3.0]])
    state = env.reset(jax.random.PRNGKey(6), world, None, PP, MP, MAPP,
                      goal_list=tour)
    # entry 0 plays the external kick-off goal
    np.testing.assert_array_equal(np.asarray(state.goal), np.asarray(tour[0]))
    assert int(state.goal_idx) == 1
    step = jax.jit(env.step_segment, static_argnames=("pp", "mp", "sp",
                                                      "mission_mode"))
    for _ in range(60):
        state, _ = step(state, PP, MP, SP, "predefined")
        if int(state.phase) == missions.PHASE_DONE:
            break
    assert int(state.phase) == missions.PHASE_DONE
    assert int(state.missions_done) == 3
    assert int(state.missions_ok) == 3          # all three tour goals reachable
    np.testing.assert_array_equal(np.asarray(state.goal), np.asarray(tour[-1]))
    # parked: further segments must not recount the finished mission
    state, _ = step(state, PP, MP, SP, "predefined")
    assert int(state.missions_done) == 3


def test_vision_sensor_rate_fusion_and_truncated_edt(world):
    """Onboard mode with sensor-rate fusion (fuse_frames=6 ~ the reference's
    octomap insertion between replans) and a truncated ESDF rebuild: the
    mission still completes collision-free on the sensed map, and the
    truncated field agrees with the exact one below the truncation radius."""
    from neoplanner_tpu.config import CameraParams
    from neoplanner_tpu.mapping import occupancy
    from neoplanner_tpu.ops import edt as edt_ops

    cam = CameraParams(width=64, height=48)
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6,
                     edt_truncation=2.0)
    goal = jnp.array([10.0, 0.0])
    state = env.reset(jax.random.PRNGKey(0), world, goal, PP, MP, mapp,
                      sensing="depth")
    step = jax.jit(env.step_segment, static_argnames=(
        "pp", "mp", "sp", "mission_mode", "sensing", "mapp", "cam", "planner",
        "np_cfg", "plan_map", "replan_mode", "fuse_frames"))
    for _ in range(30):
        state, _ = step(state, PP, MP, SP, "manual", "depth", mapp, cam,
                        fuse_frames=6)
        if bool(state.reached) or bool(state.failed):
            break
    assert bool(state.reached), (bool(state.failed), float(state.steps))
    assert float(state.metrics[2]) < 1e-3
    # more occupancy got fused than a single-frame-per-segment run would see
    assert float(jnp.sum(occupancy.to_occupancy(state.logodds, mapp))) > 0

    # the truncated field matches an exact rebuild below the truncation radius
    # (rebuild from the same log-odds snapshot: state.emap itself is one
    # rebuild older than state.logodds, which kept fusing during the segment)
    occ = occupancy.to_occupancy(state.logodds, mapp)
    exact = np.asarray(edt_ops.edt(occ, mapp.resolution))
    # lite vision maps store the field bf16: compare at bf16 precision
    got = np.asarray(env.rebuild_esdf(state, mapp).emap.esdf
                     .astype(jnp.float32))
    exact = np.asarray(jnp.asarray(exact).astype(jnp.bfloat16)
                       .astype(jnp.float32))
    near = exact < mapp.edt_truncation
    np.testing.assert_allclose(got[near], exact[near], rtol=1e-2, atol=1e-2)
    assert np.all(got[~near] >= mapp.edt_truncation - 2e-2)


def test_sensor_rate_esdf_rebuild(world):
    """esdf_rate > 1 rebuilds the truncated ESDF after interleaved frame
    fusions (the reference recomputes per projected_map message,
    esdf.py:29-33): with esdf_rate == fuse_frames no fusion happens after
    the last rebuild, so the segment-end field must EXACTLY equal a fresh
    rebuild from the final log-odds — while the default once-per-segment
    cadence leaves a one-frame-stale field."""
    from neoplanner_tpu.config import CameraParams

    cam = CameraParams(width=64, height=48)
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6,
                     edt_truncation=2.0)
    goal = jnp.array([10.0, 0.0])
    step = jax.jit(env.step_segment, static_argnames=(
        "pp", "mp", "sp", "mission_mode", "sensing", "mapp", "cam", "planner",
        "np_cfg", "plan_map", "replan_mode", "fuse_frames", "esdf_rate"))

    def run(esdf_rate):
        state = env.reset(jax.random.PRNGKey(0), world, goal, PP, MP, mapp,
                          sensing="depth")
        for _ in range(3):
            state, _ = step(state, PP, MP, SP, "manual", "depth", mapp, cam,
                            fuse_frames=2, esdf_rate=esdf_rate)
        return state

    fresh = run(esdf_rate=2)
    assert np.isfinite(np.asarray(fresh.drone.pos)).all()
    want = np.asarray(env.rebuild_esdf(fresh, mapp).emap.esdf)
    np.testing.assert_array_equal(np.asarray(fresh.emap.esdf), want)

    # the default cadence still flies (its field may be up to one frame
    # stale — whether that shows up in the truncated bf16 field depends on
    # how far the drone moved, so no strict inequality here)
    stale = run(esdf_rate=1)
    assert np.isfinite(np.asarray(stale.drone.pos)).all()


def test_neo_replan_frame_shared_with_fusion(world):
    """With an NN planner in depth mode, the replan-time camera frame is
    rendered once at full resolution and feeds BOTH the map fusion and the
    net (the reference's camera topic topology): the fused log-odds after a
    neo segment must be bit-identical to manually fusing the full-res frame,
    even when fusion_row_stride would stride expert-mode fusion frames."""
    from neoplanner_tpu.config import CameraParams, NetParams
    from neoplanner_tpu.learn import train as train_mod
    from neoplanner_tpu.sense import raycast

    cam = CameraParams(width=64, height=48)
    netp = NetParams(img_width=64, img_height=48, backbone="smallconv")
    net_vars = train_mod.init_params(jax.random.PRNGKey(0), netp)
    mapp = MapParams(width=128, height=96, origin_x=-2.0, origin_y=-4.8,
                     edt_truncation=2.0, fusion="2d_dense",
                     fusion_row_stride=4)
    state = env.reset(jax.random.PRNGKey(0), world, jnp.array([8.0, 0.0]),
                      PP, MP, mapp, sensing="depth")

    depth_full = raycast.render_depth_auto(state.world, state.drone.pos,
                                           state.drone.quat, cam)
    want = env.fuse_frame(state, mapp, cam, depth=depth_full).logodds

    step = jax.jit(env.step_segment, static_argnames=(
        "pp", "mp", "sp", "mission_mode", "sensing", "mapp", "cam", "planner",
        "np_cfg", "plan_map"))
    out, _ = step(state, PP, MP, SP, "manual", "depth", mapp, cam,
                  planner="neo", net_vars=net_vars, np_cfg=netp)
    np.testing.assert_array_equal(np.asarray(out.logodds), np.asarray(want))
