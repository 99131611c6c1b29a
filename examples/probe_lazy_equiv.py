"""Closed-loop bit-equality probe: NEO_BANK=lazy vs full, warmstart planner.

The round-5 marathon's scene-warmstart cell scored 96.8% under the lazy bank
vs 98.1% under NEO_BANK=full on the identical stack and identical PRNG keys
(missions done even differ: 777 vs 782). Selection is provably invariant
(test_expert.py::test_lazy_bank_selection_invariance) and the in-kernel
freeze/exit masks are designed bit-exact, so the two closed loops should be
bit-identical. This probe decides between three worlds:

  1. lazy != lazy      -> the loop itself is nondeterministic (rules out any
                          bank conclusion from single marathon runs)
  2. lazy == lazy but lazy != full
                       -> a real lazy-bank behavioral leak; bisect further
  3. lazy == full      -> the marathon delta was my misreading / stale env

NEO_BANK is read at TRACE time, so each arm re-jits its own step fn.

Env knobs: PROBE_B (256), PROBE_SEGS (6).
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

from neoplanner_tpu.config import (MapParams, MissionParams, PlannerParams,  # noqa: E402
                                   SimParams, WorldParams)
from neoplanner_tpu.sim import env  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402


def main():
    B = int(os.environ.get("PROBE_B", 256))
    K = int(os.environ.get("PROBE_SEGS", 6))
    pp = PlannerParams(max_iters=32, samples_per_piece=24, retry_num=2,
                       extra_lateral_scales=(2.5, -2.5), max_ls=4)
    mp, sp = MissionParams(goal_clear_dis=pp.safe_dis + 0.3), SimParams()
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    wp = WorldParams(num_boxes=10)
    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B, wp)
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    def run_arm(bank):
        os.environ["NEO_BANK"] = bank
        reset = jax.jit(jax.vmap(lambda k, w: env.reset(
            k, w, None, pp, mp, mapp, sensing="gt", plan_map="scene")))
        s = reset(keys, worlds)
        step = jax.jit(lambda st: jax.vmap(lambda x: env.step_segment(
            x, pp, mp, sp, mission_mode="random", sensing="gt", mapp=None,
            planner="warmstart", plan_map="scene")[0])(st))
        t0 = time.time()
        for _ in range(K):
            s = step(s)
        pos = np.asarray(s.drone.pos)
        print(f"  bank={bank}: {time.time()-t0:.1f}s  "
              f"done={int(np.asarray(s.missions_done).sum())} "
              f"ok={int(np.asarray(s.missions_ok).sum())} "
              f"iters={int(np.asarray(s.iter_sum).sum())}", flush=True)
        return pos, np.asarray(s.metrics), np.asarray(s.carry_wpts)

    lazy1 = run_arm("lazy")
    lazy2 = run_arm("lazy")
    full = run_arm("full")

    def cmp(name, a, b):
        eq = all(np.array_equal(x, y) for x, y in zip(a, b))
        if eq:
            print(f"{name}: BIT-IDENTICAL", flush=True)
        else:
            d = [float(np.max(np.abs(x.astype(np.float64)
                                     - y.astype(np.float64))))
                 for x, y in zip(a, b)]
            n = [int((x != y).sum()) for x, y in zip(a, b)]
            print(f"{name}: DIFFER  max|d| per leaf {d}  n_diff {n}",
                  flush=True)

    cmp("lazy vs lazy (determinism)", lazy1, lazy2)
    cmp("lazy vs full (bank equivalence)", lazy1, full)


if __name__ == "__main__":
    main()
