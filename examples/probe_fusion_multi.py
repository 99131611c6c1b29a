"""TPU probe for the v3 multi-frame fusion kernel: Mosaic compile, agreement
with F sequential dense fusions, and wall time at batch.

One TPU job at a time (CLAUDE.md rule 10)."""
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

from neoplanner_tpu.config import CameraParams, MapParams, WorldParams  # noqa: E402
from neoplanner_tpu.core import frames  # noqa: E402
from neoplanner_tpu.mapping import occupancy, occupancy_pallas  # noqa: E402
from neoplanner_tpu.sense import raycast  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402


def timeit(fn, *args, reps=5):
    def fetch(out):
        return float(np.asarray(jnp.sum(out)))
    fetch(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        fetch(fn(*args))
    return (time.time() - t0) / reps


def main():
    B = int(os.environ.get("PROBE_B", 4096))
    F = int(os.environ.get("PROBE_F", 5))
    rs = 4
    cam = CameraParams(width=160, height=120)
    mp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B,
                                     WorldParams(num_boxes=10))
    # F poses per env along a short forward track
    pos0 = jax.random.uniform(jax.random.PRNGKey(1), (B, 3),
                              minval=jnp.array([0.0, -3.0, 1.5]),
                              maxval=jnp.array([6.0, 3.0, 2.5]))
    yaw = jax.random.uniform(jax.random.PRNGKey(2), (B,), minval=-3.1,
                             maxval=3.1)
    step = jnp.stack([0.15 * jnp.cos(yaw), 0.15 * jnp.sin(yaw),
                      jnp.zeros_like(yaw)], -1)
    poss = pos0[:, None, :] + jnp.arange(F)[None, :, None] * step[:, None, :]
    quats = jnp.broadcast_to(jax.vmap(frames.quat_from_yaw)(yaw)[:, None, :],
                             (B, F, 4)).copy()

    # render all frames: nested vmap (env, frame)
    @jax.jit
    def renders(w, p, q):
        return jax.vmap(lambda wi, pe, qe: jax.vmap(
            lambda pi, qi: raycast.render_depth_auto(wi, pi, qi, cam,
                                                     row_stride=rs))(pe, qe))(
            w, p, q)

    depths = renders(worlds, poss, quats)
    _ = float(np.asarray(depths).sum())
    print(f"B={B} F={F}: renders done "
          f"({timeit(renders, worlds, poss, quats)*1e3:.1f} ms)", flush=True)

    lo0 = jnp.zeros((B, mp.height, mp.width))

    @jax.jit
    def seq(lo, d, p, q):
        for f in range(F):
            lo = jax.vmap(lambda l, dd, pp_, qq: (
                occupancy_pallas.insert_depth_2d_dense(
                    l, dd, pp_, qq, cam, mp, row_stride=rs)))(
                lo, d[:, f], p[:, f], q[:, f])
        return lo

    @jax.jit
    def multi(lo, d, p, q):
        return jax.vmap(lambda l, dd, pp_, qq: (
            occupancy_pallas.insert_depth_2d_dense_multi(
                l, dd, pp_, qq, cam, mp, row_stride=rs)))(lo, d, p, q)

    lo_s = seq(lo0, depths, poss, quats)
    lo_m = multi(lo0, depths, poss, quats)
    ls, lm = np.asarray(lo_s), np.asarray(lo_m)
    thr = occupancy._l(mp.occ_threshold) + 1e-6
    occ_eq = ((ls > thr) == (lm > thr)).mean()
    print(f"max|seq-multi|={np.abs(ls - lm).max():.3e}  "
          f"binarize agree={occ_eq:.6f}", flush=True)
    print(f"seq x{F}: {timeit(seq, lo0, depths, poss, quats)*1e3:.1f} ms",
          flush=True)
    print(f"multi:   {timeit(multi, lo0, depths, poss, quats)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
