"""Break one sensor-rate fusion frame into its pieces at batch (TPU).

The fusion chain (render + dense polar fuse, ~100 ms/frame at B=4096) is
~600 ms of the 869 ms vision segment — the dominant stage after round 4's
tracker/EDT wins. This pins which piece binds: the strided Pallas render,
occupancy.polar_columns (XLA column reduce), the window slice, the dense
update kernel, or the write-back.
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
                                   PlannerParams, WorldParams)
from neoplanner_tpu.core import frames  # noqa: E402
from neoplanner_tpu.mapping import occupancy, occupancy_pallas  # noqa: E402
from neoplanner_tpu.sense import raycast  # noqa: E402
from neoplanner_tpu.sim import env  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402


def timeit(fn, *args, reps=5):
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
    rs = int(os.environ.get("PROF_ROW_STRIDE", 4))
    cam = CameraParams(width=160, height=120)
    pp = PlannerParams(esdf_interp="mxu")
    mp = MissionParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6,
                     edt_truncation=2.0, fusion="2d_dense",
                     fusion_row_stride=rs)
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B,
                                     WorldParams(num_boxes=10))
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.jit(jax.vmap(lambda k, w: env.reset(
        k, w, None, pp, mp, mapp, sensing="depth")))(keys, worlds)
    _ = float(np.asarray(states.steps).sum())
    print(f"B={B} rs={rs} backend={jax.default_backend()}", flush=True)

    # full fuse_frame
    fuse = jax.jit(jax.vmap(lambda x: env.fuse_frame(x, mapp, cam).logodds))
    print(f"fuse_frame total:        {timeit(fuse, states)*1e3:.1f} ms",
          flush=True)

    # 1. strided render
    rnd = jax.jit(jax.vmap(lambda x: raycast.render_depth_auto(
        x.world, x.drone.pos, x.drone.quat, cam, row_stride=rs)))
    print(f"render strided:          {timeit(rnd, states)*1e3:.1f} ms",
          flush=True)
    depth = rnd(states)
    _ = float(np.asarray(jnp.sum(depth)))

    # 2. polar column tables from a given depth image
    pc = jax.jit(lambda s, d: jax.vmap(
        lambda dd, p, q: occupancy.polar_columns(dd, p, q, cam, mapp, rs))(
            d, s.drone.pos, s.drone.quat))
    print(f"polar_columns:           {timeit(pc, states, depth)*1e3:.1f} ms",
          flush=True)

    # 3. whole dense fuse given the depth (polar + window + kernel + splice)
    df = jax.jit(lambda s, d: jax.vmap(
        lambda lo, dd, p, q: occupancy_pallas.insert_depth_2d_dense(
            lo, dd, p, q, cam, mapp, row_stride=rs,
            interpret=jax.default_backend() != "tpu"))(
            s.logodds, d, s.drone.pos, s.drone.quat))
    print(f"dense fuse (given depth):{timeit(df, states, depth)*1e3:.1f} ms",
          flush=True)

    # 4. window slice + write-back only (no kernel)
    def slice_only(s):
        H, W = mapp.height, mapp.width
        ch, cw = occupancy_pallas._window_cells(cam, mapp)
        row_d = (s.drone.pos[:, 1] - mapp.origin_y) / mapp.resolution
        col_d = (s.drone.pos[:, 0] - mapp.origin_x) / mapp.resolution
        r0 = jnp.clip(jnp.round(row_d - ch / 2), 0, H - ch).astype(jnp.int32)
        c0 = jnp.clip(jnp.round(col_d - cw / 2), 0, W - cw).astype(jnp.int32)
        wins = jax.vmap(lambda lo, r, c: jax.lax.dynamic_slice(
            lo, (r, c), (ch, cw)))(s.logodds, r0, c0)
        return jax.vmap(lambda lo, wn, r, c: jax.lax.dynamic_update_slice(
            lo, wn + 0.001, (r, c)))(s.logodds, wins, r0, c0)
    so = jax.jit(slice_only)
    print(f"window slice+writeback:  {timeit(so, states)*1e3:.1f} ms",
          flush=True)

    # 5. scatter backend for reference
    sc = jax.jit(lambda s, d: jax.vmap(
        lambda lo, dd, p, q: occupancy.insert_depth_2d(
            lo, dd, p, q, cam, mapp, row_stride=rs))(
            s.logodds, d, s.drone.pos, s.drone.quat))
    print(f"scatter fuse (given d):  {timeit(sc, states, depth)*1e3:.1f} ms",
          flush=True)

    # 6. full-res render (NN frame) for comparison
    rnd1 = jax.jit(jax.vmap(lambda x: raycast.render_depth_auto(
        x.world, x.drone.pos, x.drone.quat, cam)))
    print(f"render full-res:         {timeit(rnd1, states)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
