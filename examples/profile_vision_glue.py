"""Profile the vision-path segment stage by stage at B=4096 — pin down the
~385 ms of the 990 ms segment that the coarse profile_vision probes miss.

Round-3 state after lane-stacked K2 + row-strided fusion rendering:
segment 989.9 ms = plan 350 + EDT 102 + track 26 + render/fuse/glue ~500.
Candidates: the 6 interleaved fuse_frame calls (strided render + dense
polar fusion each), the full-res NN frame inside _replan, full_state_cmd,
the des-state buffer splice, and random-goal resampling.

    python examples/profile_vision_glue.py 2>&1 | tee /tmp/vglue.log
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neoplanner_tpu.config import (CameraParams, MapParams, MissionParams,  # noqa: E402
                                   PlannerParams, SimParams, WorldParams)
from neoplanner_tpu.mapping import esdf as esdf_mod  # noqa: E402
from neoplanner_tpu.ops import minco  # noqa: E402
from neoplanner_tpu.sense import raycast  # noqa: E402
from neoplanner_tpu.sim import env, missions  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402


def timeit(fn, *args, reps=3):
    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jnp.sum(leaf)))
    fetch(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        fetch(fn(*args))
    return (time.time() - t0) / reps


def main():
    B = int(os.environ.get("PROF_B", 4096))
    fuse = int(os.environ.get("PROF_FUSE", 6))
    rs = int(os.environ.get("PROF_ROW_STRIDE", 4))
    from neoplanner_tpu.learn import train as train_mod
    net_vars, np_cfg = train_mod.load_checkpoint(
        "/root/repo/artifacts/planner_net_smallconv")
    cam = CameraParams(width=np_cfg.img_width, height=np_cfg.img_height)
    pp = PlannerParams(max_iters=24, samples_per_piece=24, retry_num=2,
                       extra_lateral_scales=(), max_ls=4, esdf_interp="mxu")
    mp, sp = MissionParams(), SimParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6,
                     edt_truncation=2.0, fusion="2d_dense",
                     fusion_row_stride=rs)
    wp = WorldParams(num_boxes=10)
    spr = mp.steps_per_replan

    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, wp)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.jit(jax.vmap(lambda k, w: env.reset(
        k, w, None, pp, mp, mapp, sensing="depth")))(keys, worlds)
    _ = float(np.asarray(states.steps).sum())
    print(f"B={B} fuse={fuse} row_stride={rs} "
          f"backend={jax.default_backend()}", flush=True)

    # the actual segment (fuse chunking included). The FULL state must be the
    # jit output: the des-state buffer is planned one segment ahead (this
    # segment tracks the OLD buffer), so returning only drone.pos from inside
    # the jit lets XLA dead-code-eliminate the whole replan + fusion chain —
    # round 4 measured a fake 138 ms "segment" that way (honest: ~870 ms).
    # Indexing .drone.pos OUTSIDE the jit keeps every leaf materialized.
    @jax.jit
    def seg(s, _f=fuse):
        return jax.vmap(lambda x: env.step_segment(
            x, pp, mp, sp, mission_mode="random", sensing="depth", mapp=mapp,
            cam=cam, planner="neo", net_vars=net_vars, np_cfg=np_cfg,
            plan_map="grid", fuse_frames=_f)[0])(s)

    dt = timeit(lambda s: seg(s).drone.pos, states)
    print(f"segment fuse={fuse}: {dt*1e3:.1f} ms "
          f"-> {B*spr/dt/1e3:.1f}k steps/s", flush=True)

    @jax.jit
    def seg1(s):
        return jax.vmap(lambda x: env.step_segment(
            x, pp, mp, sp, mission_mode="random", sensing="depth", mapp=mapp,
            cam=cam, planner="neo", net_vars=net_vars, np_cfg=np_cfg,
            plan_map="grid", fuse_frames=1)[0])(s)

    dt = timeit(lambda s: seg1(s).drone.pos, states)
    print(f"segment fuse=1: {dt*1e3:.1f} ms", flush=True)

    # one interleaved fusion frame = strided render + dense polar fuse
    @jax.jit
    def fuse_one(s):
        return jax.vmap(lambda x: env.fuse_frame(x, mapp, cam).logodds)(s)

    dt = timeit(fuse_one, states)
    print(f"fuse_frame (strided render + dense fuse): {dt*1e3:.1f} ms",
          flush=True)

    # strided render alone
    @jax.jit
    def render_strided(s):
        return jax.vmap(lambda x: raycast.render_depth_auto(
            x.world, x.drone.pos, x.drone.quat, cam, row_stride=rs))(s)

    dt = timeit(render_strided, states)
    print(f"render strided only: {dt*1e3:.1f} ms", flush=True)

    # full-res render (the NN frame inside _replan)
    @jax.jit
    def render_full(s):
        return jax.vmap(lambda x: raycast.render_depth_auto(
            x.world, x.drone.pos, x.drone.quat, cam))(s)

    dt = timeit(render_full, states)
    print(f"render full-res only (NN frame): {dt*1e3:.1f} ms", flush=True)

    # NN predict on a rendered frame (traced standalone)
    from neoplanner_tpu.plan import nn_init

    depth = jax.jit(render_full)(states)

    @jax.jit
    def nn_only(s, d):
        def one(x, dd):
            ahead = x.buffer[spr][:2]
            tgt = jnp.stack([x.goal, jnp.zeros(2)])
            return nn_init.predict(net_vars, np_cfg, dd, x.drone,
                                   mp.des_pos_z, ahead, tgt, pp)[0]
        return jax.vmap(one)(s, d)

    dt = timeit(nn_only, states, depth)
    print(f"nn predict only: {dt*1e3:.1f} ms", flush=True)

    # local target on the sensed grid
    @jax.jit
    def tgt(s):
        def one(x):
            return missions.set_local_target(
                x.emap, x.buffer[spr][0], x.goal, x.key, x.fail_count,
                mp, pp)[0]
        return jax.vmap(one)(s)

    dt = timeit(tgt, states)
    print(f"set_local_target (grid) only: {dt*1e3:.1f} ms", flush=True)

    # ESDF window extraction (solver input gather)
    @jax.jit
    def window(s):
        def one(x):
            c = x.buffer[spr][0]
            return esdf_mod.make_window(x.emap, c, 96)[0]
        return jax.vmap(one)(s)

    dt = timeit(window, states)
    print(f"make_window only: {dt*1e3:.1f} ms", flush=True)

    # plan, traj only vs incl full_state_cmd
    @jax.jit
    def plan_traj(s):
        return jax.vmap(lambda x: env._replan(
            x, pp, mp, "neo", net_vars, np_cfg, cam, "grid")[0].int_wpts)(s)

    dt = timeit(plan_traj, states)
    print(f"plan traj-only: {dt*1e3:.1f} ms", flush=True)

    @jax.jit
    def plan_cmd(s):
        return jax.vmap(lambda x: env._replan(
            x, pp, mp, "neo", net_vars, np_cfg, cam, "grid")[1])(s)

    dt = timeit(plan_cmd, states)
    print(f"plan incl full_state_cmd: {dt*1e3:.1f} ms", flush=True)

    # ---- plan-stage internals (round-5h: plan is ~80% of the segment) ----
    from neoplanner_tpu.plan import costs as costs_mod
    from neoplanner_tpu.plan import expert, neo
    from neoplanner_tpu.ops import minco as minco_mod

    # whole NEO plan minus target selection / full_state_cmd
    @jax.jit
    def enhanced_only(s, d):
        def one(x, dd):
            ahead = x.buffer[spr]
            tgt = jnp.stack([x.goal, jnp.zeros(2)])
            return neo.enhanced_plan(x.emap, net_vars, np_cfg, dd, x.drone,
                                     mp.des_pos_z, ahead[:2], tgt,
                                     x.key, pp).int_wpts
        return jax.vmap(one)(s, d)

    dt = timeit(enhanced_only, states, depth)
    print(f"nn + warm_start_plan only: {dt*1e3:.1f} ms", flush=True)

    # the in-kernel grid solver alone, warm lane only (no skip, no acceptance)
    @jax.jit
    def solve_warm_only(s, d):
        from neoplanner_tpu.plan import solve_pallas_grid
        def one(x, dd):
            ahead = x.buffer[spr]
            tgt = jnp.stack([x.goal, jnp.zeros(2)])
            q0, ts0 = nn_init.predict(net_vars, np_cfg, dd, x.drone,
                                      mp.des_pos_z, ahead[:2], tgt, pp)
            head = expert.pad_boundary_state(ahead[:2], pp)
            tail = expert.pad_boundary_state(tgt, pp)
            win, worg = expert.make_plan_window(x.emap, head, tail, pp)
            x0 = costs_mod.pack(q0, minco_mod.T_to_tau(ts0, pp.t_min,
                                                       pp.t_max), pp)
            return solve_pallas_grid.solve_grid(x0, head, tail, win, worg,
                                                pp)[0]
        return jax.vmap(one)(s, d)

    dt = timeit(solve_warm_only, states, depth)
    print(f"solve_grid warm lane only (incl nn+window): {dt*1e3:.1f} ms",
          flush=True)

    # acceptance re-eval: traj_costs on the FULL map (nearest), 3 lanes/env
    @jax.jit
    def accept_only(s):
        import dataclasses
        cpp = dataclasses.replace(pp, esdf_interp="nearest")
        def one(x):
            ahead = x.buffer[spr]
            tgt = jnp.stack([x.goal, jnp.zeros(2)])
            head = expert.pad_boundary_state(ahead[:2], pp)
            tail = expert.pad_boundary_state(tgt, pp)
            seeds = expert.seed_bank(head[0], tail[0], x.key, pp)[:3]
            ts0 = expert.init_ts(pp)
            def lane(q0):
                return costs_mod.traj_costs(head, tail, q0, ts0, x.emap,
                                            cpp)[0]
            return jax.vmap(lane)(seeds)
        return jax.vmap(one)(s)

    dt = timeit(accept_only, states)
    print(f"acceptance traj_costs x3 lanes (nearest, full map): "
          f"{dt*1e3:.1f} ms", flush=True)

    # one tracking chunk (spr/fuse substeps on the grid metric)
    chunk = spr // fuse

    @jax.jit
    def track_chunk(s):
        return jax.vmap(lambda x: env._track_segment(
            x, x.buffer[:chunk], pp, mp, sp, "grid")[0].pos)(s)

    dt = timeit(track_chunk, states)
    print(f"track chunk ({chunk} substeps, grid metric): {dt*1e3:.1f} ms",
          flush=True)

    # goal resampling (vets against the ground-truth scene)
    @jax.jit
    def goals(s):
        def one(x):
            k = jax.random.split(x.key)[1]
            return missions.sample_clear_goal(k, x.flap, x.scene,
                                              mp.goal_clear_dis)[0]
        return jax.vmap(one)(s)

    dt = timeit(goals, states)
    print(f"sample_clear_goal only: {dt*1e3:.1f} ms", flush=True)

    # buffer splice
    nbuf = states.buffer.shape[1]
    nts = env.n_traj_samples(pp, mp)

    @jax.jit
    def splice(s, new_cmd, ok):
        def one(buf, nc, o):
            shifted = jnp.concatenate(
                [buf[spr:], jnp.broadcast_to(buf[-1], (spr, 3, 2))])
            planned = jnp.concatenate(
                [nc, jnp.broadcast_to(nc[-1], (nbuf - nc.shape[0], 3, 2))])
            return jnp.where(o, planned, shifted)
        return jax.vmap(one)(s.buffer, new_cmd, ok)

    new_cmd = jnp.zeros((B, nts, 3, 2))
    ok = jnp.ones((B,), bool)
    dt = timeit(splice, states, new_cmd, ok)
    print(f"buffer splice only: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
