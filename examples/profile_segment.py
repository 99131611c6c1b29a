"""Profile the closed-loop segment on TPU: batch scaling + stage breakdown.

Diagnoses the round-1 B=4096 scaling collapse (BASELINE.md: 169 -> 19
steps/s/env from B=1024 to B=4096) by timing the full segment, the plan-only
stage, and the track-only stage at both batch sizes, and reporting device
memory stats after each allocation.

Run on the TPU (background; compiles are cached in .jax_cache):
    python examples/profile_segment.py 2>&1 | tee /tmp/profile_segment.log
"""

import dataclasses
import json
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
from neoplanner_tpu.plan import expert  # noqa: E402
from neoplanner_tpu.sim import env  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402


def mem_mb():
    stats = jax.devices()[0].memory_stats() or {}
    return round(stats.get("bytes_in_use", 0) / 1e6, 1)


def timeit(fn, *args, reps=3, warmup=1):
    # fetch-forced: block_until_ready can return at enqueue under the axon
    # tunnel (CLAUDE.md measurement rule) — reduce to a scalar and fetch
    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jnp.sum(leaf)))
    for _ in range(warmup):
        fetch(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        fetch(fn(*args))
    return (time.time() - t0) / reps


def state_bytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def main():
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "planner_net_smallconv")
    from neoplanner_tpu.learn import train as train_mod
    net_vars, np_cfg = train_mod.load_checkpoint(ckpt)
    cam = CameraParams(width=np_cfg.img_width, height=np_cfg.img_height)

    pp_trim = PlannerParams(max_iters=24, samples_per_piece=24, retry_num=2,
                            extra_lateral_scales=())
    pp_full = PlannerParams(max_iters=32, samples_per_piece=32, retry_num=5,
                            extra_lateral_scales=(2.5, -2.5, 5.0, -5.0))
    mp = MissionParams()
    sp = SimParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    wp = WorldParams(num_boxes=10)

    results = {}
    print(f"backend={jax.default_backend()} mem0={mem_mb()}MB", flush=True)

    for B in (1024, 4096):
        worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, wp)
        keys = jax.random.split(jax.random.PRNGKey(1), B)
        states = jax.jit(jax.vmap(
            lambda k, w: env.reset(k, w, None, pp_trim, mp, mapp,
                                   plan_map="scene")))(keys, worlds)
        jax.block_until_ready(states.drone.pos)
        sb = state_bytes(states)
        print(f"B={B}: state={sb/1e6:.0f}MB ({sb/B/1e3:.0f}KB/env) "
              f"mem={mem_mb()}MB", flush=True)

        # full segment (neo, trim profile — the bench config)
        @jax.jit
        def seg(s):
            return jax.vmap(lambda x: env.step_segment(
                x, pp_trim, mp, sp, mission_mode="random", sensing="gt",
                cam=cam, planner="neo", net_vars=net_vars, np_cfg=np_cfg,
                plan_map="scene")[0])(s)

        t_seg = timeit(seg, states)
        print(f"B={B} neo-trim segment: {t_seg*1e3:.1f} ms "
              f"-> {B*60/t_seg/1e3:.1f}k steps/s  mem={mem_mb()}MB", flush=True)
        results[f"seg_neo_trim_B{B}_ms"] = round(t_seg * 1e3, 1)

        # plan-only (expert bank on the scene map — the dominant stage)
        scene0 = states.scene
        head = jnp.tile(jnp.array([[0.0, 0.0], [0.5, 0.0], [0.0, 0.0]])[None],
                        (B, 1, 1))
        tail = jnp.tile(jnp.array([[5.0, 0.0], [0.8, 0.0], [0.0, 0.0]])[None],
                        (B, 1, 1))
        pkeys = jax.random.split(jax.random.PRNGKey(2), B)

        @jax.jit
        def plan_only(sc, h, t, k):
            return jax.vmap(lambda a, b, c, d: expert.plan(a, b, c, d, pp_trim)
                            )(sc, h, t, k)

        t_plan = timeit(plan_only, scene0, head, tail, pkeys)
        print(f"B={B} expert-trim plan only: {t_plan*1e3:.1f} ms", flush=True)
        results[f"plan_trim_B{B}_ms"] = round(t_plan * 1e3, 1)

        # track-only: scan 60 substeps with a held buffer
        @jax.jit
        def track_only(s):
            return jax.vmap(lambda x: env._track_segment(
                x, x.buffer[:60], pp_trim, mp, sp, "scene")[0])(s)

        t_track = timeit(track_only, states)
        print(f"B={B} track only: {t_track*1e3:.1f} ms", flush=True)
        results[f"track_B{B}_ms"] = round(t_track * 1e3, 1)

        del states, worlds
        print(f"B={B} done, mem={mem_mb()}MB", flush=True)

    # full deployed profile at B=1024 (12 lanes / 32 samples / 32 iters —
    # the reference's deployed YAML; expert_planner.py:213-225 runs scipy
    # L-BFGS-B maxiter=15000 but converges in O(30) iters on these problems).
    # PS_FULL_ITERS adds convergence-budget variants, e.g. "32,128".
    B = 1024
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, wp)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    for iters in [int(s) for s in
                  os.environ.get("PS_FULL_ITERS", "32").split(",")]:
        pp_i = dataclasses.replace(pp_full, max_iters=iters)
        states = jax.jit(jax.vmap(
            lambda k, w: env.reset(k, w, None, pp_i, mp, mapp,
                                   plan_map="scene")))(keys, worlds)

        @jax.jit
        def seg_full(s, pp_i=pp_i):
            return jax.vmap(lambda x: env.step_segment(
                x, pp_i, mp, sp, mission_mode="random", sensing="gt",
                planner="expert", plan_map="scene")[0])(s)

        t_full = timeit(seg_full, states, reps=2)
        print(f"B={B} expert-full segment (iters={iters}): "
              f"{t_full*1e3:.1f} ms -> {B*60/t_full/1e3:.1f}k steps/s",
              flush=True)
        results[f"seg_expert_full_B{B}_i{iters}_ms"] = round(t_full * 1e3, 1)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
