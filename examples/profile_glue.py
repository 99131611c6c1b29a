"""Profile the scene-path segment *glue* at B=4096 — everything that is
neither the plan bank nor the tracking scan.

Round-3 state: segment 273 ms = plan 134 + track 41 + ~98 ms unexplained.
Candidates: minco.full_state_cmd (900-sample trajectory evaluation), the
des-state buffer splice (960x3x2 f32 per env = 94 MB at B=4096), random-goal
resampling (sample_clear_goal), and mission bookkeeping.

    python examples/profile_glue.py 2>&1 | tee /tmp/glue.log
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
from neoplanner_tpu.ops import minco  # noqa: E402
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
    from neoplanner_tpu.learn import train as train_mod
    net_vars, np_cfg = train_mod.load_checkpoint(
        "/root/repo/artifacts/planner_net_smallconv")
    cam = CameraParams(width=np_cfg.img_width, height=np_cfg.img_height)
    pp = PlannerParams(max_iters=24, samples_per_piece=24, retry_num=2,
                       extra_lateral_scales=(), max_ls=4)
    mp, sp = MissionParams(), SimParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    wp = WorldParams(num_boxes=10)
    spr = mp.steps_per_replan

    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, wp)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.jit(jax.vmap(lambda k, w: env.reset(
        k, w, None, pp, mp, mapp, plan_map="scene")))(keys, worlds)
    _ = float(np.asarray(states.steps).sum())
    print(f"B={B} backend={jax.default_backend()}", flush=True)

    @jax.jit
    def seg(s):
        return jax.vmap(lambda x: env.step_segment(
            x, pp, mp, sp, mission_mode="random", sensing="gt",
            cam=cam, planner="neo", net_vars=net_vars, np_cfg=np_cfg,
            plan_map="scene")[0])(s)

    dt = timeit(lambda s: seg(s).drone.pos, states)
    print(f"segment: {dt*1e3:.1f} ms -> {B*spr/dt/1e3:.1f}k steps/s",
          flush=True)

    # plan, traj only (full_state_cmd DCE'd away)
    @jax.jit
    def plan_traj(s):
        return jax.vmap(lambda x: env._replan(
            x, pp, mp, "neo", net_vars, np_cfg, cam, "scene")[0].int_wpts)(s)

    dt = timeit(plan_traj, states)
    print(f"plan traj-only: {dt*1e3:.1f} ms", flush=True)

    # plan incl. new_cmd (what the segment actually pays)
    @jax.jit
    def plan_cmd(s):
        return jax.vmap(lambda x: env._replan(
            x, pp, mp, "neo", net_vars, np_cfg, cam, "scene")[1])(s)

    dt = timeit(plan_cmd, states)
    print(f"plan incl full_state_cmd: {dt*1e3:.1f} ms", flush=True)

    # full_state_cmd standalone at segment shapes
    nts = env.n_traj_samples(pp, mp)
    coeffs = jnp.zeros((B, pp.num_pieces, 6, pp.dims))
    ts = jnp.full((B, pp.num_pieces), pp.init_t)

    @jax.jit
    def cmd_only(c, t):
        return jax.vmap(lambda cc, tt: minco.full_state_cmd(
            cc, tt, mp.cmd_hz, nts)[0])(c, t)

    dt = timeit(cmd_only, coeffs, ts)
    print(f"full_state_cmd only ({nts} samples): {dt*1e3:.1f} ms", flush=True)

    # buffer splice arithmetic (shift + broadcast + where), as in step_segment
    nbuf = states.buffer.shape[1]

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

    # goal resampling (random-mode bookkeeping)
    @jax.jit
    def goals(s):
        def one(x):
            k = jax.random.split(x.key)[1]
            return missions.sample_clear_goal(k, x.flap, x.scene,
                                              mp.goal_clear_dis)[0]
        return jax.vmap(one)(s)

    dt = timeit(goals, states)
    print(f"sample_clear_goal only: {dt*1e3:.1f} ms", flush=True)

    # track
    @jax.jit
    def track(s):
        return jax.vmap(lambda x: env._track_segment(
            x, x.buffer[:spr], pp, mp, sp, "scene")[0].pos)(s)

    dt = timeit(track, states)
    print(f"track only: {dt*1e3:.1f} ms", flush=True)

    # set_local_target (scene backend)
    @jax.jit
    def tgt(s):
        def one(x):
            return missions.set_local_target(
                x.scene, x.buffer[spr][0], x.goal, x.key, x.fail_count,
                mp, pp)[0]
        return jax.vmap(one)(s)

    dt = timeit(tgt, states)
    print(f"set_local_target only: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
