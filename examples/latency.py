"""Single-replan latency (B=1) on the round-5 default stack, fetch-forced.

Refreshes BASELINE.md's B=1 row (round-3 numbers: scene p50 29.0 ms /
grid 33.0 ms on the per-iteration chain; 31.4 / 36.6 with the in-kernel
solver). The reference's per-solve print is traj_planner_node.py:492-509.
Every call includes the ~25-30 ms axon tunnel round-trip — the p50 is
therefore a ceiling on true on-device latency; the spread (p90-p50) is the
honest jitter signal.

Env knobs: LAT_REPS (50), LAT_PROFILE (full|trim, default full = the
reference's 12-lane deployed profile).
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

from neoplanner_tpu.config import MapParams, MissionParams, PlannerParams, \
    WorldParams  # noqa: E402
from neoplanner_tpu.mapping import esdf as esdf_mod  # noqa: E402
from neoplanner_tpu.plan import expert  # noqa: E402
from neoplanner_tpu.sim import env  # noqa: E402
from neoplanner_tpu.world import scenegen, voxelize  # noqa: E402


def percentiles(fn, reps):
    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jnp.sum(leaf)))
    fetch(fn())  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fetch(fn())
        ts.append((time.time() - t0) * 1e3)
    ts = np.sort(np.array(ts))
    return ts[len(ts) // 2], ts[int(len(ts) * 0.9)]


def main():
    reps = int(os.environ.get("LAT_REPS", 50))
    if os.environ.get("LAT_PROFILE", "full") == "full":
        pp = PlannerParams(max_iters=32, samples_per_piece=32, retry_num=5,
                           extra_lateral_scales=(1.8, -1.8, 2.5, -2.5),
                           max_ls=8)
    else:
        pp = PlannerParams(max_iters=24, samples_per_piece=24, retry_num=2,
                           extra_lateral_scales=(), max_ls=4)
    mp = MissionParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    world = scenegen.generate(jax.random.PRNGKey(0), WorldParams(num_boxes=10))
    state = env.reset(jax.random.PRNGKey(1), world, jnp.array([12.0, 0.0]),
                      pp, mp, mapp, plan_map="scene")
    head = jnp.stack([state.drone.pos[:2], state.drone.vel[:2],
                      jnp.zeros(2)])
    tail = jnp.stack([jnp.array([12.0, 0.0]), jnp.zeros(2), jnp.zeros(2)])
    key = jax.random.PRNGKey(2)

    plan_scene = jax.jit(lambda: expert.plan(
        state.scene, head, tail, key, pp))
    p50, p90 = percentiles(plan_scene, reps)
    print(f"scene replan B=1 ({os.environ.get('LAT_PROFILE', 'full')}): "
          f"p50 {p50:.1f} ms / p90 {p90:.1f} ms", flush=True)

    grid = voxelize.occupancy_2d(world, mapp)
    emap_grid = esdf_mod.build(grid, (mapp.origin_x, mapp.origin_y),
                               mapp.resolution)
    plan_grid = jax.jit(lambda: expert.plan(emap_grid, head, tail, key, pp))
    p50, p90 = percentiles(plan_grid, reps)
    print(f"grid replan B=1 ({os.environ.get('LAT_PROFILE', 'full')}): "
          f"p50 {p50:.1f} ms / p90 {p90:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
