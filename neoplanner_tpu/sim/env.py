"""The closed loop: mission FSM + receding-horizon replanning + setpoint tracking.

This file is where the reference's entire multi-process node graph —
manager_node (FSM/goals), traj_planner_node (action server, replanning loop,
tracking timer), octomap_server/ESDF, PX4+Gazebo (dynamics) — collapses into two
pure functions over one device-resident pytree:

    state = reset(key, world, ...)
    state = step_segment(state, ...)   # one replan period: plan once + track
                                       # cmd_hz * replan_period setpoints

``step_segment`` is jit/vmap-friendly: thousands of envs advance in lockstep, each
segment = one trajectory optimization (vmapped multi-start L-BFGS) + 60 fused
control/physics substeps. Mapping to the reference:

- replan-from-1s-ahead:    get_drone_state_ahead (traj_planner_node.py:527-537);
  the des-state buffer is kept rolled so 'now' is index 0 and the splice point
  (future_index, :577-578) is statically steps_per_replan.
- local target + retries:  set_local_target + the 10-retry ladder (:400-448) —
  failures here cost one replan period each (as they do in real time) and bump
  ``fail_count`` which feeds noise into the next attempt.
- tracking timer:          tracking_cmd_timer_cb (:667-703) as a lax.scan.
- metrics at 10 Hz:        record_metric_cb + get_weighted_metric (:196-210,
  333-363), accumulated on device.
- mission FSM:             manager_node.py:93-98; 'random' goal mode for datagen
  (manager_node.py:160-193).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from neoplanner_tpu.config import (CameraParams, MapParams, MissionParams,
                                   PlannerParams, SimParams)
from neoplanner_tpu.core.types import BoxWorld, DroneState, ESDFMap
from neoplanner_tpu.mapping import esdf as esdf_map
from neoplanner_tpu.mapping import occupancy
from neoplanner_tpu.mapping import query
from neoplanner_tpu.mapping import scene as scene_map
from neoplanner_tpu.ops import minco
from neoplanner_tpu.plan import expert
from neoplanner_tpu.sense import raycast
from neoplanner_tpu.sim import dynamics, missions
from neoplanner_tpu.world import voxelize

METRIC_WEIGHTS = (1.0, 1.0, 100.0)  # distance, feasibility, collision
METRIC_EVERY = 6                    # 60 Hz cmd / 10 Hz metric evaluation


@struct.dataclass
class EnvState:
    drone: DroneState
    emap: ESDFMap
    scene: scene_map.SceneMap  # analytic footprint map (plan_map='scene' path)
    world: BoxWorld          # ground-truth scene (renders depth in 'depth' mode)
    logodds: jnp.ndarray     # (H, W) occupancy log-odds ('depth' mode; else zeros)
    buffer: jnp.ndarray      # (N_BUF, 3, 2) des pos/vel/acc samples; 'now' = row 0
    goal: jnp.ndarray        # (2,)
    phase: jnp.ndarray       # int32 mission FSM phase
    near_goal: jnp.ndarray   # bool: local target == global target already
    reached: jnp.ndarray     # bool
    failed: jnp.ndarray      # bool
    fail_count: jnp.ndarray  # int32 consecutive replan failures
    steps: jnp.ndarray       # int32 cmd steps in current mission
    flap: jnp.ndarray        # int32 random-goal flip-flop
    metric_pos: jnp.ndarray  # (2,) last 10 Hz-sampled position
    metrics: jnp.ndarray     # (3,) accumulated distance / vel-viol / coll-viol
    carry_wpts: jnp.ndarray  # (D, M-1) waypoints relative to plan-init pos
    carry_ts: jnp.ndarray    # (M,) last solution durations ('warmstart' planner)
    has_carry: jnp.ndarray   # bool: carry_wpts/ts hold a previous solution
    plan_count: jnp.ndarray  # int32 optimizations run
    iter_sum: jnp.ndarray    # int32 total L-BFGS iterations
    missions_done: jnp.ndarray  # int32 completed missions (random mode)
    missions_ok: jnp.ndarray    # int32 of those, reached the goal
    metric_ok_sum: jnp.ndarray  # () summed weighted metric of the ok missions
    goal_list: jnp.ndarray   # (G, 2) predefined goal tour ('predefined'
    #                          mission mode, manager_config.yaml:3; (1, 2)
    #                          dummy otherwise)
    goal_idx: jnp.ndarray    # int32 cursor: next tour entry to dispatch
    key: jnp.ndarray


@struct.dataclass
class SegmentInfo:
    """Per-segment record emitted by step_segment — everything the expert-data
    recorder needs to form one training sample (record_planner.py:136-150)."""

    planned: jnp.ndarray    # bool: a replan was attempted this segment
    ok: jnp.ndarray         # bool: the plan was accepted
    int_wpts: jnp.ndarray   # (D, M-1) solution waypoints (world frame)
    ts: jnp.ndarray         # (M,)
    drone: DroneState       # drone state at record time (segment start)
    plan_init: jnp.ndarray  # (2, 2) pos/vel the plan started from
    target: jnp.ndarray     # (2, 2) local target state
    iters: jnp.ndarray      # L-BFGS iterations spent
    trace: jnp.ndarray      # (spr, 5, 3) per-substep [pos, vel, des_pos,
                            # des_vel, des_acc] — the tracking-error log
                            # (save_tracking_err, traj_planner_node.py:310-331)


def n_traj_samples(pp: PlannerParams, mp: MissionParams) -> int:
    return int(math.ceil(pp.num_pieces * pp.t_max * mp.cmd_hz))


def n_buffer(pp: PlannerParams, mp: MissionParams) -> int:
    return n_traj_samples(pp, mp) + mp.steps_per_replan


def _hold_buffer(pos2d: jnp.ndarray, n: int) -> jnp.ndarray:
    buf = jnp.zeros((n, 3, 2))
    return buf.at[:, 0, :].set(pos2d[None, :])


def reset(key: jnp.ndarray, world: BoxWorld, goal: Optional[jnp.ndarray],
          pp: PlannerParams, mp: MissionParams, mapp: MapParams,
          start_pos: Optional[jnp.ndarray] = None,
          skip_takeoff: bool = True, sensing: str = "gt",
          plan_map: str = "grid",
          goal_list: Optional[jnp.ndarray] = None) -> EnvState:
    """Build the map from the box world and initialize one env.

    goal=None selects 'random' goal sampling at reset (datagen mode); a concrete
    goal mirrors an RViz /move_base_simple/goal message (manager_node.py:122-137).

    goal_list (G, 2) arms the 'predefined' mission tour
    (manager_node.py:153-166, manager_config.yaml:2-3): the first tour entry
    becomes the initial goal (the reference kicks the tour off with an
    external RViz goal; the rebuild has no external trigger, so entry 0
    plays that role) and step_segment(mission_mode='predefined') dispatches
    the remaining entries as missions complete, then parks at PHASE_DONE.

    sensing='gt' bakes the ground-truth map at reset (the reference's global-map
    mode, sim_global.launch + publish_pointcloud.cpp); 'depth' starts the map
    unknown and builds it online from rendered depth (the onboard mode).

    plan_map='scene' with sensing='gt' is the simulation fast path: every
    distance query (planning costs, metric, local-target escape) hits the
    analytic scene SDF, so the per-env (H, W) ESDF/log-odds grids are replaced
    by 1x1 dummies — ~1 MB/env of HBM that capped batch scaling in round 1.
    Pass the same plan_map to step_segment.
    """
    lite = (sensing == "gt" and plan_map == "scene")
    origin = jnp.array([mapp.origin_x, mapp.origin_y])
    if lite:
        # placeholder grids: never queried (all query paths dispatch to the
        # scene); any stray lookup reads "free" (FAR), matching an empty map
        emap = ESDFMap(occupancy=jnp.zeros((1, 1)),
                       esdf=jnp.full((1, 1), esdf_map.FAR),
                       grad_x=jnp.zeros((1, 1)), grad_y=jnp.zeros((1, 1)),
                       origin=origin,
                       resolution=jnp.asarray(mapp.resolution, jnp.float32))
    elif sensing == "gt":
        emap = esdf_map.build(voxelize.occupancy_2d(world, mapp), origin,
                              mapp.resolution)
    else:
        # onboard mode: lite profile (bf16 truncated field, no grad/occupancy
        # planes) — must match what rebuild_esdf produces so the jitted step
        # signature is identical between reset- and step-produced states
        emap = esdf_map.build(jnp.zeros((mapp.height, mapp.width)), origin,
                              mapp.resolution, max_dist=mapp.edt_truncation,
                              lite=True)

    scene = scene_map.build(world, mapp)
    key, k_goal = jax.random.split(key)
    flap = jnp.zeros((), jnp.int32)
    if goal_list is not None:
        goal_list = jnp.asarray(goal_list, jnp.float32)
        if goal is None:
            goal = goal_list[0]
        goal_idx = jnp.ones((), jnp.int32)
    else:
        goal_list = jnp.zeros((1, 2), jnp.float32)
        goal_idx = jnp.zeros((), jnp.int32)
    if goal is None:
        # goals are vetted against the ground-truth scene in every sensing
        # mode (the benchmark harness knows the world even when the drone
        # only senses it)
        goal, flap = missions.sample_clear_goal(k_goal, flap, scene,
                                                mp.goal_clear_dis)
    goal = jnp.asarray(goal)

    if start_pos is None:
        start_pos = jnp.array([0.0, 0.0])
    z0 = mp.hover_height if skip_takeoff else 0.0
    drone = dynamics.init_state(jnp.array([start_pos[0], start_pos[1], z0]))
    phase = jnp.asarray(
        missions.PHASE_MISSION if skip_takeoff else missions.PHASE_TAKEOFF,
        jnp.int32)

    return EnvState(
        drone=drone, emap=emap, scene=scene, world=world,
        # log-odds fusion state only exists in onboard sensing mode
        logodds=(jnp.zeros((1, 1)) if sensing == "gt"
                 else occupancy.logodds_init(mapp)),
        buffer=_hold_buffer(start_pos, n_buffer(pp, mp)),
        goal=goal, phase=phase,
        near_goal=jnp.asarray(False), reached=jnp.asarray(False),
        failed=jnp.asarray(False), fail_count=jnp.zeros((), jnp.int32),
        steps=jnp.zeros((), jnp.int32), flap=flap,
        metric_pos=start_pos, metrics=jnp.zeros(3),
        carry_wpts=jnp.zeros((pp.dims, pp.num_wpts)),
        # explicit dtype: a weak-typed full() here changes the jitted step's
        # input signature between the reset-produced and step-produced states,
        # costing one silent (and very expensive) recompile
        carry_ts=jnp.full((pp.num_pieces,), pp.init_t, dtype=jnp.float32),
        has_carry=jnp.asarray(False),
        plan_count=jnp.zeros((), jnp.int32), iter_sum=jnp.zeros((), jnp.int32),
        missions_done=jnp.zeros((), jnp.int32),
        missions_ok=jnp.zeros((), jnp.int32),
        metric_ok_sum=jnp.zeros(()), goal_list=goal_list, goal_idx=goal_idx,
        key=key)


def _replan(state: EnvState, pp: PlannerParams, mp: MissionParams,
            planner: str = "expert", net_vars=None, np_cfg=None,
            cam: Optional[CameraParams] = None, plan_map: str = "grid",
            replan_mode: str = "periodic",
            depth: Optional[jnp.ndarray] = None):
    """Plan from the state one replan period ahead (buffer row steps_per_replan).

    ``planner`` is the reference's selected_planner dispatch
    (traj_planner_node.py:97-109, 544-560):
      'expert'    — multi-start + retry bank (covers 'basic'/'batch' modes)
      'warmstart' — re-seed from the previous solution carried in body-relative
                    coordinates (get_int_wpts_local, :580-587, 597-614)
      'geo'       — wavefront cost-to-go init + refine (the GeoPlanner baseline,
                    geo_planner.py:19-35, as the batched device variant)
      'nn'        — network prediction used as-is (no refinement, no rejection)
      'neo'       — network prediction + expert refinement (the paper's planner)

    ``replan_mode='global'`` plans directly to the global goal with zero target
    velocity and no local-target selection (global_planning,
    traj_planner_node.py:365-374); the returned ``near=True`` then stops all
    further replanning. The other modes use the receding-horizon local target.
    """
    spr = mp.steps_per_replan
    ahead = state.buffer[spr]                       # (3, 2): pos, vel, acc
    head = expert.pad_boundary_state(ahead[:2], pp)

    # planning-time collision backend: sensed grid (parity/vision) or analytic
    # scene SDF (simulation fast path, mapping/scene.py)
    pmap = state.scene if plan_map == "scene" else state.emap

    key, k_t, k_p = jax.random.split(state.key, 3)
    if replan_mode == "global":
        target_state = jnp.stack([state.goal, jnp.zeros(2)])
        near = jnp.asarray(True)
    else:
        target_state, near = missions.set_local_target(
            pmap, ahead[0], state.goal, k_t, state.fail_count, mp, pp)
    tail = expert.pad_boundary_state(target_state, pp)

    if planner == "expert":
        traj = expert.plan(pmap, head, tail, k_p, pp)
    elif planner == "warmstart":
        q0 = state.carry_wpts + ahead[0][:, None]
        traj = expert.plan_with_carry(pmap, head, tail, q0, state.carry_ts,
                                      state.has_carry, k_p, pp)
    elif planner == "geo":
        from neoplanner_tpu.plan import geo
        # the wavefront needs the rasterized grid regardless of plan_map (the
        # cost-to-go field relaxes over cells)
        if state.emap.esdf.shape[0] == 1:
            raise ValueError("geo planner needs the rasterized grid; reset "
                             "with plan_map='grid' (scene-lite state has none)")
        traj = geo.geo_plan_device(state.emap, head, tail, k_p, pp)
    elif planner in ("nn", "neo"):
        assert net_vars is not None and np_cfg is not None and cam is not None
        if depth is None:
            depth = raycast.render_depth_auto(state.world, state.drone.pos,
                                              state.drone.quat, cam)
        if planner == "nn":
            from neoplanner_tpu.plan import nn_init
            traj = nn_init.nn_trajectory(net_vars, np_cfg, depth, state.drone,
                                         mp.des_pos_z, ahead[:2], target_state,
                                         head, tail, pp)
        else:
            from neoplanner_tpu.plan import neo
            traj = neo.enhanced_plan(pmap, net_vars, np_cfg, depth,
                                     state.drone, mp.des_pos_z, ahead[:2],
                                     target_state, k_p, pp)
    else:
        raise ValueError(f"unknown planner: {planner}")

    new_cmd, _, _ = minco.full_state_cmd(traj.coeffs, traj.ts, mp.cmd_hz,
                                         n_traj_samples(pp, mp))
    return traj, new_cmd, near, key, ahead[:2], target_state


def _track_segment(state: EnvState, track_cmds: jnp.ndarray,
                   pp: PlannerParams, mp: MissionParams, sp: SimParams,
                   plan_map: str = "grid", i0: int = 0):
    """Scan control/physics substeps over the setpoints. ``i0`` offsets the
    10 Hz metric tick counter so chunked tracking (sensor-rate fusion) keeps
    the exact metric cadence of one unchunked segment.

    On TPU with the analytic scene metric backend the whole segment runs in
    one Pallas program (sim/track_pallas.py; NEO_TRACKER=xla reverts) —
    the lax.scan below is the reference/XLA form and the grid-metric path."""
    from neoplanner_tpu.sim import track_pallas
    if track_pallas.enabled():
        if plan_map == "scene":
            return track_pallas.track_segment(state, track_cmds, pp, mp, sp,
                                              i0)
        if state.emap.esdf.shape[0] > 1:   # real per-env grid (not scene-lite)
            return track_pallas.track_segment_grid(state, track_cmds, pp, mp,
                                                   sp, i0)
    metric_map = state.scene if plan_map == "scene" else state.emap
    active_phase = (state.phase == missions.PHASE_MISSION)
    # takeoff climbs toward des_pos_z on held-position setpoints
    # (manager_node.py:300-313); hover/done hold without mission bookkeeping
    moving = active_phase | (state.phase == missions.PHASE_TAKEOFF)

    def substep(carry, cmd):
        drone, reached, steps, metrics, metric_pos, i = carry
        pos_des = jnp.array([cmd[0, 0], cmd[0, 1], mp.des_pos_z])
        vel_des = jnp.array([cmd[1, 0], cmd[1, 1], 0.0])
        acc_des = jnp.array([cmd[2, 0], cmd[2, 1], 0.0])
        speed = jnp.linalg.norm(cmd[1])
        yaw_des = jnp.where(speed > 0.05, jnp.arctan2(cmd[1, 1], cmd[1, 0]),
                            drone.yaw)

        stepped = dynamics.step(drone, pos_des, vel_des, acc_des, yaw_des, sp)
        freeze = reached | ~moving
        drone = jax.tree_util.tree_map(
            lambda old, new: jnp.where(freeze, old, new), drone, stepped)

        pos2 = drone.pos[:2]
        reached = reached | (active_phase
                             & (jnp.linalg.norm(pos2 - state.goal)
                                < mp.target_reach_threshold))

        # 10 Hz closed-loop metric (traj_planner_node.py:333-363)
        tick = (i % METRIC_EVERY == 0) & active_phase & ~reached
        d_dist = jnp.linalg.norm(pos2 - metric_pos)
        violate_vel = jnp.sum(drone.vel[:2] ** 2) - pp.v_max ** 2
        dis, _ = query.distance(metric_map, pos2)
        # clamp at 0 so the scene backend (signed inside obstacles) scores the
        # same as the reference's unsigned grid EDT (esdf.py:29)
        violate_dis = pp.safe_dis - jnp.maximum(dis, 0.0)
        delta = jnp.stack([d_dist,
                           jnp.maximum(violate_vel, 0.0) ** 3,
                           jnp.maximum(violate_dis, 0.0) ** 3])
        metrics = metrics + jnp.where(tick, delta, 0.0)
        metric_pos = jnp.where(tick, pos2, metric_pos)

        steps = steps + jnp.where(active_phase & ~reached, 1, 0)
        trace_row = jnp.stack([drone.pos, drone.vel, pos_des, vel_des, acc_des])
        return (drone, reached, steps, metrics, metric_pos, i + 1), trace_row

    init = (state.drone, state.reached, state.steps, state.metrics,
            state.metric_pos, jnp.asarray(i0, jnp.int32))
    (drone, reached, steps, metrics, metric_pos, _), trace = jax.lax.scan(
        substep, init, track_cmds)
    return drone, reached, steps, metrics, metric_pos, trace


def fuse_frame(state: EnvState, mapp: MapParams, cam: CameraParams,
               depth: Optional[jnp.ndarray] = None, depth_stride: int = 1
               ) -> EnvState:
    """Render a depth frame from the current pose and fuse it into the
    log-odds grid (octomap_server's per-message insertion) — no ESDF rebuild.
    Sensor-rate fusion interleaves this with tracking substeps.

    Fusion frames render at mapp.fusion_row_stride vertical stride (the 2-D
    polar consumers reduce columns to one range each); the 3-D fusion mode
    always renders full-res. A pre-rendered ``depth`` frame (with the stride
    it was rendered at) skips the render — the replan-time frame is shared
    with the NN this way, one camera stream feeding both consumers as the
    reference's topics do."""
    if depth is not None:
        rs = depth_stride
    else:
        rs = mapp.fusion_row_stride if mapp.fusion != "3d" else 1
        depth = raycast.render_depth_auto(state.world, state.drone.pos,
                                          state.drone.quat, cam,
                                          row_stride=rs)
    if mapp.fusion == "2d_dense":
        from neoplanner_tpu.mapping import occupancy_pallas
        if not occupancy_pallas.window_fits(cam, mapp):
            # over-range config: the 128-cell dense window would silently
            # drop far hits/carves — use the scatter backend (same result,
            # slower) rather than diverge from '2d'
            logodds = occupancy.insert_depth_2d(
                state.logodds, depth, state.drone.pos, state.drone.quat,
                cam, mapp, row_stride=rs)
        else:
            logodds = occupancy_pallas.insert_depth_2d_dense(
                state.logodds, depth, state.drone.pos, state.drone.quat, cam,
                mapp, row_stride=rs, interpret=jax.default_backend() != "tpu")
    elif mapp.fusion == "2d":
        logodds = occupancy.insert_depth_2d(state.logodds, depth,
                                            state.drone.pos,
                                            state.drone.quat, cam, mapp,
                                            row_stride=rs)
    else:
        logodds = occupancy.insert_depth(state.logodds, depth,
                                         state.drone.pos, state.drone.quat,
                                         cam, mapp)
    return state.replace(logodds=logodds)


def rebuild_esdf(state: EnvState, mapp: MapParams) -> EnvState:
    """Binarize the fused log-odds and rebuild the (optionally truncated) ESDF
    (ESDF.occupancy_map_cb, esdf.py:11-33). Keeps the state's memory profile:
    a lite map (depth-mode reset) rebuilds lite."""
    import os
    lite = state.emap.occupancy.shape != state.emap.esdf.shape
    if (lite and mapp.edt_truncation > 0.0
            and state.logodds.shape[0] % 8 == 0
            and jax.default_backend() == "tpu"
            and os.environ.get("NEO_EDT_BACKEND", "fused") != "xla"):
        # fused rebuild: binarize + banded EDT + clamp + bf16 in one Pallas
        # program per env (ops/edt_pallas.rebuild_truncated_lite;
        # NEO_EDT_BACKEND=xla reverts to the pass chain for A/B)
        from neoplanner_tpu.core.types import ESDFMap
        from neoplanner_tpu.ops import edt_pallas
        thr = occupancy._l(mapp.occ_threshold) + 1e-6
        esdf = edt_pallas.rebuild_truncated_lite(
            state.logodds, float(thr), mapp.resolution, mapp.edt_truncation)
        emap = ESDFMap(
            occupancy=jnp.zeros((1, 1)), esdf=esdf,
            grad_x=jnp.zeros((1, 1)), grad_y=jnp.zeros((1, 1)),
            origin=jnp.array([mapp.origin_x, mapp.origin_y],
                             dtype=jnp.float32),
            resolution=jnp.asarray(mapp.resolution, dtype=jnp.float32))
        return state.replace(emap=emap)
    occ = occupancy.to_occupancy(state.logodds, mapp)
    emap = esdf_map.build(occ, jnp.array([mapp.origin_x, mapp.origin_y]),
                          mapp.resolution, max_dist=mapp.edt_truncation,
                          lite=lite)
    return state.replace(emap=emap)


def sense_and_map(state: EnvState, mapp: MapParams, cam: CameraParams,
                  depth: Optional[jnp.ndarray] = None, depth_stride: int = 1
                  ) -> EnvState:
    """Render a depth frame from the current pose, fuse it, rebuild the ESDF.

    The perception side-chain of the reference (depth cam -> octomap_server ->
    projected_map -> ESDF.occupancy_map_cb, SURVEY.md §3.1) as one fused pass.
    """
    return rebuild_esdf(fuse_frame(state, mapp, cam, depth, depth_stride),
                        mapp)


def step_segment(state: EnvState, pp: PlannerParams, mp: MissionParams,
                 sp: SimParams, mission_mode: str = "manual",
                 sensing: str = "gt", mapp: Optional[MapParams] = None,
                 cam: Optional[CameraParams] = None, planner: str = "expert",
                 net_vars=None, np_cfg=None, plan_map: str = "grid",
                 replan_mode: str = "periodic", fuse_frames: int = 1,
                 goal_stream: Optional[jnp.ndarray] = None,
                 esdf_rate: int = 1):
    """One replan period: sense (in 'depth' mode), (maybe) replan, then track
    steps_per_replan setpoints. fuse_frames > 1 (depth mode) fuses that many
    depth frames per segment — one at replan time plus fuse_frames-1
    interleaved with tracking — approximating octomap_server's sensor-rate
    insertion; the ESDF rebuild stays once per segment unless esdf_rate > 1.

    goal_stream (C, 2), when given, delivers C goal updates *within* the
    segment (the reference tracker's asynchronous goal topic,
    tracker_planner_node.py:160-162): the replan at segment start consumes
    the latest stored goal (set by the previous segment's final update), and
    tracking chunks switch the goal mid-segment, so the reached check and the
    next replan see sub-period target motion. C must equal fuse_frames when
    both chunk the segment.

    esdf_rate > 1 (depth mode, requires fuse_frames chunking) also rebuilds
    the truncated ESDF after every interleaved frame fusion, so the 10 Hz
    metric and local-target escape query a sensor-rate field — the
    reference's per-message recompute (esdf.py:29-33, SURVEY §3.1 hot
    loop 3) instead of a once-per-segment snapshot.

    mission_mode 'manual': stop at PHASE_DONE when reached/failed.
    mission_mode 'random': sample the next goal and continue (the data-collection
    driver, manager_node.py:160-166).
    mission_mode 'predefined': dispatch the next entry of the goal tour armed
    at reset (goal_list=...) when a mission completes, park at PHASE_DONE once
    the tour is exhausted (manager_node.py:153-166, manager_config.yaml:2-3).

    replan_mode is the reference's execute_mission dispatch
    (traj_planner_node.py:233-245):
      'periodic' — replan once per replan period, stop once the local target
                   is the global goal (replan_cb gating, :421-427)
      'online'   — replan back-to-back until the goal is reached
                   (online_planning's busy loop, :376-388): every segment
                   replans, the near-goal gate is ignored
      'global'   — exactly one plan, straight to the global goal
                   (global_planning, :365-374); no receding horizon
    """
    if replan_mode not in ("periodic", "online", "global"):
        raise ValueError(f"unknown replan_mode: {replan_mode}")
    spr = mp.steps_per_replan
    nbuf = state.buffer.shape[0]

    # --- perception (onboard mode): one depth frame fused per replan period —
    # the reference's octomap updates continuously but the planner only consumes
    # the map at replan time. With an NN planner the replan-time frame is
    # rendered ONCE at full resolution and shared between fusion and the net
    # (the reference's camera topic feeds both octomap_server and NNPlanner);
    # expert-family planners keep the cheap row-strided fusion render.
    nn_depth = None
    if sensing == "depth":
        assert mapp is not None and cam is not None
        if planner in ("nn", "neo"):
            nn_depth = raycast.render_depth_auto(
                state.world, state.drone.pos, state.drone.quat, cam)
            state = sense_and_map(state, mapp, cam, depth=nn_depth)
        else:
            state = sense_and_map(state, mapp, cam)

    # --- takeoff / hover phases: climb to hover height, then start the mission
    at_height = jnp.abs(state.drone.pos[2] - mp.hover_height) < 0.05
    phase = jnp.where((state.phase == missions.PHASE_TAKEOFF) & at_height,
                      missions.PHASE_MISSION, state.phase)
    state = state.replace(phase=phase)

    # --- replan (masked out when not needed; lanes in a vmapped batch that skip
    # still pay the compute — planning is the segment's dominant cost either way)
    do_replan = ((state.phase == missions.PHASE_MISSION)
                 & ~state.reached & ~state.failed)
    if replan_mode != "online":
        # periodic/global stop replanning once the plan targets the global goal
        # (replan_cb gating on near_global_target, traj_planner_node.py:421-427);
        # online keeps replanning every segment until reached (:383-388)
        do_replan = do_replan & ~state.near_goal
    traj, new_cmd, near, key, plan_init, target_state = _replan(
        state, pp, mp, planner, net_vars, np_cfg, cam, plan_map, replan_mode,
        depth=nn_depth)
    plan_ok = traj.ok & do_replan

    # --- des-state buffer: this segment tracks rows [0, spr); the next buffer is
    # either the freshly planned trajectory (spliced at exactly the state we
    # planned from) or the old buffer shifted left (terminal state held)
    track_cmds = state.buffer[:spr]
    shifted = jnp.concatenate(
        [state.buffer[spr:], jnp.broadcast_to(state.buffer[-1], (spr, 3, 2))])
    planned = jnp.concatenate(
        [new_cmd, jnp.broadcast_to(new_cmd[-1], (nbuf - new_cmd.shape[0], 3, 2))])
    buffer = jnp.where(plan_ok, planned, shifted)

    fail_count = jnp.where(do_replan,
                           jnp.where(plan_ok, 0, state.fail_count + 1),
                           state.fail_count)
    near_goal = jnp.where(plan_ok, near, state.near_goal)
    plan_count = state.plan_count + do_replan.astype(jnp.int32)
    iter_sum = state.iter_sum + jnp.where(do_replan, traj.iters, 0)

    # body-relative solution carry for the 'warmstart' planner
    # (traj_planner_node.py:512, 571, 580-587)
    carry_wpts = jnp.where(plan_ok, traj.int_wpts - plan_init[0][:, None],
                           state.carry_wpts)
    carry_ts = jnp.where(plan_ok, traj.ts, state.carry_ts)
    has_carry = state.has_carry | plan_ok

    state = state.replace(buffer=buffer, fail_count=fail_count,
                          near_goal=near_goal, plan_count=plan_count,
                          iter_sum=iter_sum, key=key, carry_wpts=carry_wpts,
                          carry_ts=carry_ts, has_carry=has_carry)

    # --- track; in onboard mode, interleave sensor-rate depth fusion between
    # tracking chunks (the reference's octomap_server inserts every frame at
    # camera rate, map_server_onboard.launch:18-32, while the planner consumes
    # the map only at replan time — fuse_frames > 1 reproduces that cadence;
    # the ESDF itself is rebuilt once per segment, before the replan above)
    drone_at_plan = state.drone   # record-time drone state for SegmentInfo
    n_chunks = fuse_frames if sensing == "depth" else 1
    if goal_stream is not None:
        if n_chunks > 1 and goal_stream.shape[0] != n_chunks:
            raise ValueError(f"goal_stream length {goal_stream.shape[0]} "
                             f"must equal fuse_frames={n_chunks}")
        n_chunks = max(n_chunks, goal_stream.shape[0])
    if esdf_rate > 1 and n_chunks <= 1:
        raise ValueError("esdf_rate > 1 requires fuse_frames chunking "
                         "(sensing='depth', fuse_frames > 1)")
    if n_chunks > 1:
        if spr % n_chunks != 0:
            raise ValueError(f"{n_chunks} chunks must divide "
                             f"steps_per_replan={spr}")
        # Mid-segment fusion has no consumer between frames when the ESDF
        # rebuilds once per segment (tracking follows the precomputed command
        # buffer) — so the per-chunk render->fuse round trips can batch: track
        # all chunks first (collecting the camera pose at each frame time),
        # then render every frame in one call and apply all carves in ONE
        # multi-frame kernel invocation (occupancy_pallas.
        # insert_depth_2d_dense_multi). NEO_FUSE_BATCH=off reverts to the
        # interleaved per-frame chain for A/B.
        import os as _os
        from neoplanner_tpu.mapping import occupancy_pallas
        batch_fuse = (
            sensing == "depth" and fuse_frames > 1 and esdf_rate == 1
            and mapp.fusion == "2d_dense"
            and mapp.width % 128 == 0 and mapp.height % 8 == 0
            and occupancy_pallas.window_fits(cam, mapp)
            and _os.environ.get("NEO_FUSE_BATCH", "on") != "off")
        chunk = spr // n_chunks
        traces = []
        fuse_pos, fuse_quat = [], []
        for c in range(n_chunks):
            if goal_stream is not None:
                state = state.replace(goal=goal_stream[c])
            drone, reached, steps, metrics, metric_pos, trace = _track_segment(
                state, track_cmds[c * chunk:(c + 1) * chunk], pp, mp, sp,
                plan_map, i0=c * chunk)
            state = state.replace(drone=drone, reached=reached, steps=steps,
                                  metrics=metrics, metric_pos=metric_pos)
            traces.append(trace)
            if sensing == "depth" and fuse_frames > 1 \
                    and c < fuse_frames - 1:
                if batch_fuse:
                    fuse_pos.append(state.drone.pos)
                    fuse_quat.append(state.drone.quat)
                else:
                    state = fuse_frame(state, mapp, cam)
                    if esdf_rate > 1 and (c + 1) % max(
                            fuse_frames // esdf_rate, 1) == 0:
                        state = rebuild_esdf(state, mapp)
        if batch_fuse and fuse_pos:
            poss = jnp.stack(fuse_pos)                     # (F, 3)
            quats = jnp.stack(fuse_quat)
            rs = mapp.fusion_row_stride
            depths = jax.vmap(lambda p, q: raycast.render_depth_auto(
                state.world, p, q, cam, row_stride=rs))(poss, quats)
            logodds = occupancy_pallas.insert_depth_2d_dense_multi(
                state.logodds, depths, poss, quats, cam, mapp, row_stride=rs,
                interpret=jax.default_backend() != "tpu")
            state = state.replace(logodds=logodds)
        trace = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *traces)
    else:
        drone, reached, steps, metrics, metric_pos, trace = _track_segment(
            state, track_cmds, pp, mp, sp, plan_map)
    info = SegmentInfo(planned=do_replan, ok=plan_ok, int_wpts=traj.int_wpts,
                       ts=traj.ts, drone=drone_at_plan, plan_init=plan_init,
                       target=target_state, iters=traj.iters, trace=trace)

    # --- mission termination: goal reached, too many consecutive replan
    # failures (traj_planner_node.py:441-445), or the 45 s cap (:253-255)
    failed = state.failed \
        | (fail_count > mp.local_target_retries) \
        | (steps > mp.max_mission_steps)

    state = state.replace(drone=drone, reached=reached, steps=steps,
                          metrics=metrics, metric_pos=metric_pos, failed=failed)

    done = reached | failed
    if mission_mode == "random":
        # a mission only counts as ok if it reached the goal AND its closed-loop
        # weighted metric stayed under the failure bar
        # (traj_planner_node.py:359-362); metrics reset per mission here so the
        # bar applies mission-by-mission
        wm = jnp.dot(metrics, jnp.array(METRIC_WEIGHTS))
        mission_ok = reached & (wm <= 10.0 * pp.collision_cost_tol)
        key, k_goal = jax.random.split(state.key)
        new_goal, new_flap = missions.sample_clear_goal(
            k_goal, state.flap, state.scene, mp.goal_clear_dis)
        state = state.replace(
            metric_ok_sum=state.metric_ok_sum
            + jnp.where(done & mission_ok, wm, 0.0),
            goal=jnp.where(done, new_goal, state.goal),
            flap=jnp.where(done, new_flap, state.flap),
            reached=jnp.where(done, False, state.reached),
            failed=jnp.where(done, False, state.failed),
            near_goal=jnp.where(done, False, state.near_goal),
            fail_count=jnp.where(done, 0, state.fail_count),
            steps=jnp.where(done, 0, state.steps),
            metrics=jnp.where(done, 0.0, state.metrics),
            missions_done=state.missions_done + done.astype(jnp.int32),
            missions_ok=state.missions_ok + (done & mission_ok).astype(
                jnp.int32),
            key=key)
    elif mission_mode == "predefined":
        # advance the goal tour (manager_node.py:153-166): on completion the
        # next list entry becomes the goal; when the cursor runs off the end
        # the env parks at PHASE_DONE like the reference manager going idle
        G = state.goal_list.shape[0]
        wm = jnp.dot(metrics, jnp.array(METRIC_WEIGHTS))
        mission_ok = reached & (wm <= 10.0 * pp.collision_cost_tol)
        # once parked at PHASE_DONE the env keeps reporting done=True every
        # segment — count a completion only the first time
        counted = done & (state.phase != missions.PHASE_DONE)
        have_next = state.goal_idx < G
        advance = counted & have_next
        next_goal = state.goal_list[jnp.minimum(state.goal_idx, G - 1)]
        state = state.replace(
            metric_ok_sum=state.metric_ok_sum
            + jnp.where(counted & mission_ok, wm, 0.0),
            goal=jnp.where(advance, next_goal, state.goal),
            goal_idx=state.goal_idx + advance.astype(jnp.int32),
            reached=jnp.where(advance, False, state.reached),
            failed=jnp.where(advance, False, state.failed),
            near_goal=jnp.where(advance, False, state.near_goal),
            fail_count=jnp.where(advance, 0, state.fail_count),
            steps=jnp.where(advance, 0, state.steps),
            metrics=jnp.where(advance, 0.0, state.metrics),
            missions_done=state.missions_done + counted.astype(jnp.int32),
            missions_ok=state.missions_ok + (counted & mission_ok).astype(
                jnp.int32),
            phase=jnp.where(counted & ~have_next, missions.PHASE_DONE,
                            state.phase))
    elif mission_mode == "manual":
        state = state.replace(
            phase=jnp.where(done, missions.PHASE_DONE, state.phase))
    else:
        raise ValueError(f"unknown mission_mode: {mission_mode}")
    return state, info


def weighted_metric(state: EnvState) -> jnp.ndarray:
    """Closed-loop weighted cost (traj_planner_node.py:333-363)."""
    return jnp.dot(state.metrics, jnp.array(METRIC_WEIGHTS))


def rollout(state: EnvState, num_segments: int, pp: PlannerParams,
            mp: MissionParams, sp: SimParams, mission_mode: str = "manual",
            sensing: str = "gt", mapp: Optional[MapParams] = None,
            cam: Optional[CameraParams] = None, planner: str = "expert",
            net_vars=None, np_cfg=None, plan_map: str = "grid",
            replan_mode: str = "periodic", fuse_frames: int = 1) -> EnvState:
    """Run num_segments replan periods under lax.scan (jit once, step many)."""
    def body(s, _):
        s2, _info = step_segment(s, pp, mp, sp, mission_mode, sensing, mapp,
                                 cam, planner, net_vars, np_cfg, plan_map,
                                 replan_mode, fuse_frames)
        return s2, None
    out, _ = jax.lax.scan(body, state, None, length=num_segments)
    return out
