"""ONE quality table: every planner × both sensing modes, one protocol.

Round-2 quality accounting was scattered across three protocols (bench
windows 100%, max_ls A/B marathon 92.6%, vision marathon 98.4%) with the
deficit attributed — but never controlled — to the reference's goal sampler
placing ~24% of far-leg goals inside safe_dis. This runs the marathon with:

  - goals vetted against the ground-truth scene (MissionParams.goal_clear_dis
    = safe_dis + 0.3, the same ring search multi_run.py applies to its fixed
    benchmark goal), so goal-placement failures are excluded a priori;
  - the reference's exact per-mission bar (reached within 45 s AND weighted
    closed-loop metric <= 10 x collision_cost_tol,
    traj_planner_node.py:333-363);
  - the same planner envelope for every cell.

Cells: {expert, warmstart, geo, nn, neo} x {scene-gt, vision}. The geo
baseline runs on the rasterized grid in both modes (its wavefront relaxes
over cells, as the reference's does). Output: a markdown table +
per-cell JSON on stdout.

Env knobs: MAR_B (256), MAR_SEGMENTS (90), MAR_PLANNERS, MAR_MODES.
"""

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
from neoplanner_tpu.sim import env  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402


def main():
    B = int(os.environ.get("MAR_B", 256))
    K = int(os.environ.get("MAR_SEGMENTS", 90))
    planners = os.environ.get("MAR_PLANNERS",
                              "expert,warmstart,geo,nn,neo").split(",")
    modes = os.environ.get("MAR_MODES", "scene,vision").split(",")

    pp = PlannerParams(max_iters=32, samples_per_piece=24, retry_num=2,
                       extra_lateral_scales=(2.5, -2.5), max_ls=4)
    mp = MissionParams(goal_clear_dis=pp.safe_dis + 0.3)
    sp = SimParams()
    wp = WorldParams(num_boxes=10)

    from neoplanner_tpu.learn import train as train_mod
    ckpt = os.environ.get("MAR_NET", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "planner_net_smallconv"))
    net_vars, np_cfg = train_mod.load_checkpoint(ckpt)
    cam = CameraParams(width=np_cfg.img_width, height=np_cfg.img_height)

    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, wp)
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    rows = []
    for mode in modes:
        for planner in planners:
            if mode == "scene":
                sensing, fuse = "gt", 1
                mapp = MapParams(width=256, height=192, origin_x=-4.0,
                                 origin_y=-9.6)
                # geo's wavefront needs the rasterized grid
                plan_map = "grid" if planner == "geo" else "scene"
            else:
                sensing, fuse = "depth", 6
                mapp = MapParams(width=256, height=192, origin_x=-4.0,
                                 origin_y=-9.6, edt_truncation=2.0,
                                 fusion="2d_dense",
                                 fusion_row_stride=int(os.environ.get(
                                     "MAR_ROW_STRIDE", "1")))
                plan_map = "grid"

            reset = jax.jit(jax.vmap(lambda k, w: env.reset(
                k, w, None, pp, mp, mapp, sensing=sensing,
                plan_map=plan_map)))
            states = reset(keys, worlds)

            from functools import partial

            @partial(jax.jit, donate_argnums=0)
            def step(s, _p=planner, _m=plan_map, _s=sensing, _f=fuse,
                     _mapp=mapp):
                return jax.vmap(lambda x: env.step_segment(
                    x, pp, mp, sp, mission_mode="random", sensing=_s,
                    mapp=_mapp, cam=cam, planner=_p, net_vars=net_vars,
                    np_cfg=np_cfg, plan_map=_m, fuse_frames=_f)[0])(s)

            t0 = time.time()
            s = step(states)
            float(np.asarray(jnp.sum(s.drone.pos)))   # compile+first fetch
            for _ in range(K - 1):
                s = step(s)
            float(np.asarray(jnp.sum(s.drone.pos)))
            wall = time.time() - t0

            done = int(np.asarray(s.missions_done).sum())
            ok = int(np.asarray(s.missions_ok).sum())
            wm = float(np.asarray(s.metric_ok_sum).sum()) / max(ok, 1)
            iters = (float(np.asarray(s.iter_sum).sum())
                     / max(float(np.asarray(s.plan_count).sum()), 1.0))
            row = {"mode": mode, "planner": planner, "missions": done,
                   "ok": ok, "ok_pct": round(100.0 * ok / max(done, 1), 1),
                   "avg_weighted_metric": round(wm, 2),
                   "avg_iters_per_plan": round(iters, 1),
                   "wall_s": round(wall, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    print("\n| mode | planner | missions | ok | ok% | avg metric | iters/plan |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['mode']} | {r['planner']} | {r['missions']} | {r['ok']} "
              f"| {r['ok_pct']} | {r['avg_weighted_metric']} "
              f"| {r['avg_iters_per_plan']} |")


if __name__ == "__main__":
    main()
