"""TPU probe for the 2-D-tile Pallas renderer: Mosaic compile, exactness vs
the XLA renderer, and wall time at batch (strided + full-res).

Run after any raycast_pallas layout change; one TPU job at a time."""
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

from neoplanner_tpu.config import CameraParams, WorldParams  # noqa: E402
from neoplanner_tpu.core import frames  # noqa: E402
from neoplanner_tpu.sense import raycast, raycast_pallas  # noqa: E402
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
    cam = CameraParams(width=160, height=120)
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B,
                                     WorldParams(num_boxes=10))
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (B, 3), minval=jnp.array([0.0, -3.0, 1.0]),
                             maxval=jnp.array([8.0, 3.0, 3.0]))
    yaw = jax.random.uniform(jax.random.PRNGKey(2), (B,), minval=-3.1,
                             maxval=3.1)
    quat = jax.vmap(frames.quat_from_yaw)(yaw)

    for rs, label in ((4, "strided rs=4"), (1, "full-res")):
        pal = jax.jit(lambda w, p, q, rs=rs: jax.vmap(
            lambda wi, pi, qi: raycast_pallas.render_depth(
                wi, pi, qi, cam, row_stride=rs))(w, p, q))
        xla = jax.jit(lambda w, p, q, rs=rs: jax.vmap(
            lambda wi, pi, qi: raycast.render_depth(
                wi, pi, qi, cam, row_stride=rs))(w, p, q))
        d_pal = pal(worlds, pos, quat)
        d_xla = xla(worlds, pos, quat)
        err = float(jnp.abs(d_pal - d_xla).max())
        frac_bad = float((jnp.abs(d_pal - d_xla) > 1e-3).mean())
        print(f"{label}: max|pal-xla|={err:.2e} frac>1e-3={frac_bad:.2e}",
              flush=True)
        print(f"{label}: pallas {timeit(pal, worlds, pos, quat)*1e3:.1f} ms"
              f"  xla {timeit(xla, worlds, pos, quat)*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
