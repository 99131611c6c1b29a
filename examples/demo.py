"""Single-mission demo: fly one goal in a random (or reference) world.

The equivalent of the reference's bash/demo.sh (bringup + publish one goal at
x=30) — except the whole stack is one process and the "RViz view" is an ASCII
render. Works on CPU (--cpu) or the TPU.

  python examples/demo.py --goal 25 0 --planner expert --sensing gt
  python examples/demo.py --world /root/reference/src/simulator/worlds/poles.world
"""

import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--goal", type=float, nargs=2, default=[25.0, 0.0])
    ap.add_argument("--start", type=float, nargs=2, default=[0.0, 0.0])
    ap.add_argument("--planner", default="expert",
                    choices=["expert", "warmstart", "geo", "nn", "neo"])
    ap.add_argument("--sensing", default="gt", choices=["gt", "depth"])
    ap.add_argument("--plan-map", default="scene", choices=["scene", "grid"])
    ap.add_argument("--world", default=None,
                    help="a Gazebo .world file (default: random boxes)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--net", default=None, help="checkpoint for nn/neo")
    ap.add_argument("--replan-mode", default="periodic",
                    choices=["periodic", "online", "global"],
                    help="the reference's replan_mode rosparam "
                         "(traj_planner_node.py:233-245)")
    ap.add_argument("--fuse-frames", type=int, default=1,
                    help="depth frames fused per segment (sensor-rate fusion; "
                         "depth sensing only)")
    ap.add_argument("--row-stride", type=int, default=1,
                    help="vertical row stride for fusion-frame rendering "
                         "(MapParams.fusion_row_stride; 1 = reference "
                         "full-res cadence)")
    ap.add_argument("--esdf-rate", type=int, default=1,
                    help="truncated-ESDF rebuilds per segment (sensor-rate "
                         "field, needs --fuse-frames > 1)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-segments", type=int, default=60)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np
    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neoplanner_tpu.config import (CameraParams, MapParams, MissionParams,
                                       PlannerParams, SimParams, WorldParams)
    from neoplanner_tpu.sim import env
    from neoplanner_tpu.world import scenegen, voxelize, worldio

    pp = PlannerParams(max_iters=96)
    mp, sp = MissionParams(), SimParams()
    mapp = MapParams(fusion_row_stride=args.row_stride)
    cam = CameraParams(width=160, height=120)

    if args.world:
        world = worldio.parse_world(args.world, max_boxes=None)
    else:
        world = scenegen.generate(jax.random.PRNGKey(args.seed), WorldParams())

    net_vars, np_cfg = None, None
    if args.planner in ("nn", "neo"):
        if not args.net:
            sys.exit("--net checkpoint required for nn/neo planners")
        from neoplanner_tpu.learn import train as train_mod
        net_vars, np_cfg = train_mod.load_checkpoint(args.net)

    goal = jnp.array(args.goal)
    state = env.reset(jax.random.PRNGKey(args.seed), world, goal, pp, mp, mapp,
                      start_pos=jnp.array(args.start), sensing=args.sensing,
                      plan_map=args.plan_map)
    step = jax.jit(env.step_segment, static_argnames=(
        "pp", "mp", "sp", "mission_mode", "sensing", "mapp", "cam", "planner",
        "np_cfg", "plan_map", "replan_mode", "fuse_frames", "esdf_rate"))

    t0 = time.time()
    path = []
    for seg in range(args.max_segments):
        state, info = step(state, pp, mp, sp, "manual", args.sensing, mapp, cam,
                           args.planner, net_vars, np_cfg, args.plan_map,
                           args.replan_mode, args.fuse_frames,
                           esdf_rate=args.esdf_rate)
        path.append(np.asarray(state.drone.pos[:2]))
        if bool(state.reached) or bool(state.failed):
            break

    wm = float(env.weighted_metric(state))
    print(f"result: {'SUCCESS' if bool(state.reached) else 'FAILED'} | "
          f"flight time {float(state.steps) / mp.cmd_hz:.1f} s | "
          f"wall {time.time() - t0:.1f} s | plans {int(state.plan_count)} | "
          f"avg L-BFGS iters {int(state.iter_sum) / max(int(state.plan_count), 1):.0f} | "
          f"weighted metric {wm:.2f}")

    # ASCII map + flown path
    occ = np.asarray(voxelize.occupancy_2d(world, mapp))
    h, w = occ.shape
    grid = [[("#" if occ[r, c] else ".") for c in range(0, w, 4)]
            for r in range(0, h, 8)]
    for p in path:
        c = int((p[0] - mapp.origin_x) / mapp.resolution) // 4
        r = int((p[1] - mapp.origin_y) / mapp.resolution) // 8
        if 0 <= r < len(grid) and 0 <= c < len(grid[0]):
            grid[r][c] = "o"
    gc = int((float(goal[0]) - mapp.origin_x) / mapp.resolution) // 4
    gr = int((float(goal[1]) - mapp.origin_y) / mapp.resolution) // 8
    if 0 <= gr < len(grid) and 0 <= gc < len(grid[0]):
        grid[gr][gc] = "X"
    print("\n".join("".join(row) for row in grid))


if __name__ == "__main__":
    main()
