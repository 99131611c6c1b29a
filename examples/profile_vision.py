"""Vision-mode (onboard sensing) throughput on the TPU, fetch-forced.

Round-1 baseline: 10.5k steps/s at B=512, 160x120 camera, full EDT rebuild per
segment (BASELINE.md). Round-2 levers measured here:
  - truncated ESDF rebuild (MapParams.edt_truncation)
  - sensor-rate fusion (fuse_frames) at the same single rebuild per segment

Env knobs: VIS_B (512), VIS_TRUNC (2.0), VIS_FUSE (6), VIS_SEGMENTS (4).
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
from neoplanner_tpu.sim import env  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402


def main():
    B = int(os.environ.get("VIS_B", 512))
    trunc = float(os.environ.get("VIS_TRUNC", 2.0))
    fuse = int(os.environ.get("VIS_FUSE", 6))
    K = int(os.environ.get("VIS_SEGMENTS", 4))

    from neoplanner_tpu.learn import train as train_mod
    net_vars, np_cfg = train_mod.load_checkpoint(os.environ.get(
        "VIS_NET", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts", "planner_net_smallconv")))
    cam = CameraParams(width=np_cfg.img_width, height=np_cfg.img_height)
    pp = PlannerParams(max_iters=24, samples_per_piece=24, retry_num=2,
                       extra_lateral_scales=(), max_ls=4,
                       esdf_interp=os.environ.get("VIS_INTERP", "mxu"))
    mp, sp = MissionParams(), SimParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6,
                     edt_truncation=trunc,
                     fusion=os.environ.get("VIS_FUSION", "2d_dense"),
                     fusion_row_stride=int(os.environ.get("VIS_ROW_STRIDE",
                                                          "4")))
    wp = WorldParams(num_boxes=10)

    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, wp)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.jit(jax.vmap(lambda k, w: env.reset(
        k, w, None, pp, mp, mapp, sensing="depth")))(keys, worlds)
    _ = float(np.asarray(states.steps).sum())
    print(f"B={B} trunc={trunc} fuse={fuse}: reset done", flush=True)

    from functools import partial

    # donated state: the steady-state loop reuses the ~300 KB/env buffers
    # (CLAUDE.md rule 5); at B=4096 the undonated copy is what OOMs
    @partial(jax.jit, donate_argnums=0)
    def step(s):
        return jax.vmap(lambda x: env.step_segment(
            x, pp, mp, sp, mission_mode="random", sensing="depth", mapp=mapp,
            cam=cam, planner="neo", net_vars=net_vars, np_cfg=np_cfg,
            plan_map="grid", fuse_frames=fuse)[0])(s)

    def fetch(s):
        return float(np.asarray(jnp.sum(s.drone.pos)))

    s = step(states)
    fetch(s)
    t0 = time.time()
    for _ in range(K):
        s = step(s)
    fetch(s)
    dt = (time.time() - t0) / K
    print(f"segment: {dt*1e3:.1f} ms -> {B*60/dt/1e3:.1f}k steps/s", flush=True)

    # run enough extra segments for missions to complete, check the bar
    for _ in range(40):
        s = step(s)
    done = int(np.asarray(s.missions_done).sum())
    ok = int(np.asarray(s.missions_ok).sum())
    print(f"missions: {ok}/{done} ok (after {K + 41} segments)", flush=True)

    if os.environ.get("VIS_BREAKDOWN", "1") != "1":
        return

    # ---- per-stage wall times at this batch
    import time as _t

    def timeit(fn, *args, reps=3):
        def fetch(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            return float(np.asarray(jnp.sum(leaf)))
        fetch(fn(*args))
        t0 = _t.time()
        for _ in range(reps):
            fetch(fn(*args))
        return (_t.time() - t0) / reps

    from neoplanner_tpu.sense import raycast
    from neoplanner_tpu.mapping import occupancy

    @jax.jit
    def render_only(s):
        return jax.vmap(lambda x: raycast.render_depth_auto(
            x.world, x.drone.pos, x.drone.quat, cam))(s)

    print(f"render only: {timeit(render_only, s)*1e3:.1f} ms", flush=True)

    @jax.jit
    def fuse_only(s):
        return jax.vmap(lambda x: env.fuse_frame(x, mapp, cam).logodds)(s)

    print(f"render+fuse only: {timeit(fuse_only, s)*1e3:.1f} ms", flush=True)

    @jax.jit
    def edt_only(s):
        return jax.vmap(lambda x: env.rebuild_esdf(x, mapp).emap.esdf)(s)

    print(f"edt rebuild only: {timeit(edt_only, s)*1e3:.1f} ms", flush=True)

    @jax.jit
    def plan_only(s):
        return jax.vmap(lambda x: env._replan(
            x, pp, mp, "neo", net_vars, np_cfg, cam, "grid")[0].int_wpts)(s)

    print(f"plan(neo on grid) only: {timeit(plan_only, s)*1e3:.1f} ms",
          flush=True)

    @jax.jit
    def track_only(s):
        return jax.vmap(lambda x: env._track_segment(
            x, x.buffer[:60], pp, mp, sp, "grid")[0].pos)(s)

    print(f"track only: {timeit(track_only, s)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
