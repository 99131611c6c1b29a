"""Reconcile segment timings: pos-only fetch vs full-state fetch vs chained.

The des-state buffer is planned one segment ahead (env.step_segment: this
segment tracks rows [0, spr) of the OLD buffer; the fresh plan is spliced
for the next segment). So a probe that fetches only `drone.pos` lets XLA
dead-code-eliminate the entire replan + fusion chain — the segment looks
7x faster than it is. This probe pins the three protocols side by side so
profile scripts use the right one (fetch a scalar that depends on EVERY
state leaf, or chain states like bench.py does).
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neoplanner_tpu.config import (CameraParams, MapParams, MissionParams,  # noqa: E402
                                   PlannerParams, SimParams, WorldParams)
from neoplanner_tpu.sim import env  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402


def main():
    B = int(os.environ.get("PROF_B", 4096))
    from neoplanner_tpu.learn import train as train_mod
    net_vars, np_cfg = train_mod.load_checkpoint(
        "/root/repo/artifacts/planner_net_smallconv")
    cam = CameraParams(width=np_cfg.img_width, height=np_cfg.img_height)
    pp = PlannerParams(max_iters=24, samples_per_piece=24, retry_num=2,
                       extra_lateral_scales=(), max_ls=4, esdf_interp="mxu")
    mp, sp = MissionParams(), SimParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6,
                     edt_truncation=2.0, fusion="2d_dense",
                     fusion_row_stride=4)
    wp = WorldParams(num_boxes=10)

    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, wp)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.jit(jax.vmap(lambda k, w: env.reset(
        k, w, None, pp, mp, mapp, sensing="depth")))(keys, worlds)
    _ = float(np.asarray(states.steps).sum())
    print(f"B={B} backend={jax.default_backend()}", flush=True)

    def seg_fn(s):
        return jax.vmap(lambda x: env.step_segment(
            x, pp, mp, sp, mission_mode="random", sensing="depth", mapp=mapp,
            cam=cam, planner="neo", net_vars=net_vars, np_cfg=np_cfg,
            plan_map="grid", fuse_frames=6)[0])(s)

    seg_pos = jax.jit(lambda s: seg_fn(s).drone.pos)

    def all_leaf_scalar(s):
        tot = jnp.zeros(())
        for leaf in jax.tree_util.tree_leaves(s):
            tot = tot + jnp.sum(leaf).astype(jnp.float32)
        return tot

    seg_full = jax.jit(lambda s: all_leaf_scalar(seg_fn(s)))
    seg_chain = jax.jit(seg_fn)

    # pos-only fetch (the suspect protocol)
    _ = float(np.asarray(jnp.sum(seg_pos(states))))
    t0 = time.time()
    for _ in range(3):
        _ = float(np.asarray(jnp.sum(seg_pos(states))))
    print(f"pos-only fetch:   {(time.time()-t0)/3*1e3:.1f} ms", flush=True)

    # full-leaf scalar fetch (DCE-proof, same input each rep)
    _ = float(np.asarray(seg_full(states)))
    t0 = time.time()
    for _ in range(3):
        _ = float(np.asarray(seg_full(states)))
    print(f"full-leaf fetch:  {(time.time()-t0)/3*1e3:.1f} ms", flush=True)

    # chained states (bench.py protocol)
    s = seg_chain(states)
    _ = float(np.asarray(jnp.sum(s.drone.pos)))
    t0 = time.time()
    for _ in range(3):
        s = seg_chain(s)
        _ = float(np.asarray(jnp.sum(s.drone.pos)))
    dt = (time.time() - t0) / 3
    print(f"chained segment:  {dt*1e3:.1f} ms -> "
          f"{B*mp.steps_per_replan/dt/1e3:.1f}k steps/s", flush=True)


if __name__ == "__main__":
    main()
