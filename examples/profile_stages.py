"""Fetch-forced stage profiling of the closed-loop segment on the TPU.

IMPORTANT: under the axon tunnel, jax.block_until_ready can return before the
remote computation finishes (donated/aliased buffers report ready early) — the
only reliable completion barrier is a host fetch of a value derived from the
result. Every timing here reduces the output to a scalar and fetches it.

    python examples/profile_stages.py 2>&1 | tee /tmp/stages.log
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
from neoplanner_tpu.plan import expert, nn_init  # noqa: E402
from neoplanner_tpu.sense import raycast  # noqa: E402
from neoplanner_tpu.sim import env  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402


def timeit(fn, *args, reps=3):
    """fn must return a pytree; we reduce+fetch to force completion."""
    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jnp.sum(leaf)))
    fetch(fn(*args))                      # warm/compile
    t0 = time.time()
    for _ in range(reps):
        v = fetch(fn(*args))
    dt = (time.time() - t0) / reps
    return dt, v


def main():
    from neoplanner_tpu.learn import train as train_mod
    net_vars, np_cfg = train_mod.load_checkpoint(
        "/root/repo/artifacts/planner_net_smallconv")
    cam = CameraParams(width=np_cfg.img_width, height=np_cfg.img_height)
    pp = PlannerParams(max_iters=24, samples_per_piece=24, retry_num=2,
                       extra_lateral_scales=())
    mp, sp = MissionParams(), SimParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    wp = WorldParams(num_boxes=10)

    for B in (int(os.environ.get("PROF_B", 1024)),):
        worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, wp)
        keys = jax.random.split(jax.random.PRNGKey(1), B)
        states = jax.jit(jax.vmap(lambda k, w: env.reset(
            k, w, None, pp, mp, mapp, plan_map="scene")))(keys, worlds)
        _ = float(np.asarray(states.steps).sum())
        print(f"B={B} reset done", flush=True)

        @jax.jit
        def seg(s):
            return jax.vmap(lambda x: env.step_segment(
                x, pp, mp, sp, mission_mode="random", sensing="gt",
                cam=cam, planner="neo", net_vars=net_vars, np_cfg=np_cfg,
                plan_map="scene")[0])(s)

        dt, _ = timeit(lambda s: seg(s).drone.pos, states)
        print(f"B={B} seg(neo-trim): {dt*1e3:.1f} ms "
              f"({B*60/dt/1e3:.1f}k steps/s)", flush=True)

        @jax.jit
        def plan_neo(s):
            return jax.vmap(lambda x: env._replan(
                x, pp, mp, "neo", net_vars, np_cfg, cam, "scene")[0].int_wpts)(s)

        dt, _ = timeit(plan_neo, states)
        print(f"B={B} plan(neo = render+nn+3-lane bank): {dt*1e3:.1f} ms",
              flush=True)

        @jax.jit
        def plan_expert(s):
            return jax.vmap(lambda x: env._replan(
                x, pp, mp, "expert", None, None, None, "scene")[0].int_wpts)(s)

        dt, _ = timeit(plan_expert, states)
        print(f"B={B} plan(expert 5-lane): {dt*1e3:.1f} ms", flush=True)

        @jax.jit
        def render_nn(s):
            def one(x):
                depth = raycast.render_depth(x.world, x.drone.pos,
                                             x.drone.quat, cam)
                ahead = x.buffer[mp.steps_per_replan]
                tgt = jnp.stack([x.goal, jnp.zeros(2)])
                return nn_init.predict(net_vars, np_cfg, depth, x.drone,
                                       mp.des_pos_z, ahead[:2], tgt, pp)[0]
            return jax.vmap(one)(s)

        dt, _ = timeit(render_nn, states)
        print(f"B={B} render+nn only: {dt*1e3:.1f} ms", flush=True)

        @jax.jit
        def render_only(s):
            return jax.vmap(lambda x: raycast.render_depth(
                x.world, x.drone.pos, x.drone.quat, cam))(s)

        dt, _ = timeit(render_only, states)
        print(f"B={B} render only: {dt*1e3:.1f} ms", flush=True)

        @jax.jit
        def track(s):
            return jax.vmap(lambda x: env._track_segment(
                x, x.buffer[:60], pp, mp, sp, "scene")[0].pos)(s)

        dt, _ = timeit(track, states)
        print(f"B={B} track only: {dt*1e3:.1f} ms", flush=True)

        # single cost evaluation + gradient at bank width (the L-BFGS inner op)
        from neoplanner_tpu.plan import costs as costs_mod
        lanes = 3
        x0 = jnp.zeros((B * lanes, pp.num_vars))
        head = jnp.tile(jnp.array([[0.0, 0.0], [0.5, 0.0], [0.0, 0.0]])[None],
                        (B * lanes, 1, 1))
        tail = jnp.tile(jnp.array([[5.0, 0.0], [0.8, 0.0], [0.0, 0.0]])[None],
                        (B * lanes, 1, 1))
        scene_rep = jax.tree_util.tree_map(
            lambda leaf: jnp.repeat(leaf, lanes, axis=0), states.scene)

        @jax.jit
        def cost_eval(xs, h, t, sc):
            return jax.vmap(lambda x, hh, tt, s: costs_mod.objective(
                x, hh, tt, s, pp))(xs, h, t, sc)

        dt, _ = timeit(cost_eval, x0, head, tail, scene_rep, reps=10)
        print(f"B={B} one cost eval ({B*lanes} lanes): {dt*1e3:.2f} ms",
              flush=True)

        @jax.jit
        def grad_eval(xs, h, t, sc):
            return jax.vmap(lambda x, hh, tt, s: jax.grad(
                costs_mod.objective)(x, hh, tt, s, pp))(xs, h, t, sc)

        dt, _ = timeit(grad_eval, x0, head, tail, scene_rep, reps=10)
        print(f"B={B} one grad eval ({B*lanes} lanes): {dt*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
