"""Isolate where L-BFGS wall time goes on the TPU (fetch-forced timings).

Compares, at the bench's bank width (B*lanes problems of dim 7):
  a) full lbfgs.minimize (while_loop, sequential ls / wide ls)
  b) a fixed-length lax.scan variant of the same iteration
  c) a chain of max_iters dependent value_and_grad evals (data floor)
  d) one value_and_grad (per-launch floor)
"""

import os
import sys
import time
from functools import partial

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neoplanner_tpu.config import MapParams, PlannerParams, WorldParams  # noqa: E402
from neoplanner_tpu.mapping import scene as scene_mod  # noqa: E402
from neoplanner_tpu.ops import lbfgs, minco  # noqa: E402
from neoplanner_tpu.plan import costs as costs_mod  # noqa: E402
from neoplanner_tpu.plan import expert  # noqa: E402
from neoplanner_tpu.world import scenegen  # noqa: E402


def timeit(fn, *args, reps=3):
    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jnp.sum(leaf)))
    fetch(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        fetch(fn(*args))
    return (time.time() - t0) / reps


def main():
    B = int(os.environ.get("PROF_B", 1024))
    lanes = 3
    N = B * lanes
    max_iters = 24
    pp = PlannerParams(max_iters=max_iters, samples_per_piece=24)

    worlds = scenegen.generate_batch(jax.random.PRNGKey(0), B,
                                     WorldParams(num_boxes=10))
    mapp = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)
    scenes = jax.vmap(lambda w: scene_mod.build(w, mapp))(worlds)
    scenes = jax.tree_util.tree_map(
        lambda leaf: jnp.repeat(leaf, lanes, axis=0), scenes)

    head = jnp.tile(jnp.array([[0.0, 0.0], [0.5, 0.0], [0.0, 0.0]])[None],
                    (N, 1, 1))
    tail = jnp.tile(jnp.array([[5.0, 0.5], [0.8, 0.0], [0.0, 0.0]])[None],
                    (N, 1, 1))
    q0 = jax.vmap(lambda h, t: expert.straight_line_wpts(h[0], t[0], pp)
                  )(head, tail)
    ts0 = jnp.tile(expert.init_ts(pp)[None], (N, 1))
    x0 = jax.vmap(lambda q, t: costs_mod.pack(
        q, minco.T_to_tau(t, pp.t_min, pp.t_max), pp))(q0, ts0)

    def make_fun(h, t, sc):
        return partial(costs_mod.objective, head_state=h, tail_state=t,
                       emap=sc, pp=pp)

    # a) full minimize, sequential vs wide ls
    for name, par in (("ls=map", False), ("ls=wide", True)):
        @jax.jit
        def solve(x0, head, tail, scenes, _par=par):
            def one(x, h, t, sc):
                return lbfgs.minimize(make_fun(h, t, sc), x,
                                      max_iters=max_iters, history=pp.history,
                                      max_ls=pp.max_ls, ftol=1e-10, gtol=1e-8,
                                      ls_parallel=_par).x
            return jax.vmap(one)(x0, head, tail, scenes)

        dt = timeit(solve, x0, head, tail, scenes)
        print(f"minimize[{name}] {max_iters} iters, N={N}: {dt*1e3:.1f} ms",
              flush=True)

    # c) chain of max_iters dependent value_and_grad evals
    @jax.jit
    def chain(x0, head, tail, scenes):
        def one(x, h, t, sc):
            fun = make_fun(h, t, sc)
            def body(i, xx):
                f, g = jax.value_and_grad(fun)(xx)
                return xx - 1e-3 * g / (1.0 + f)
            return jax.lax.fori_loop(0, max_iters, body, x)
        return jax.vmap(one)(x0, head, tail, scenes)

    dt = timeit(chain, x0, head, tail, scenes)
    print(f"{max_iters} chained value_and_grad (gd): {dt*1e3:.1f} ms", flush=True)

    # same chain but 9x the evals (gd + 8 fwd evals, the ls-equivalent work)
    @jax.jit
    def chain9(x0, head, tail, scenes):
        def one(x, h, t, sc):
            fun = make_fun(h, t, sc)
            def body(i, xx):
                f, g = jax.value_and_grad(fun)(xx)
                steps = 0.5 ** jnp.arange(8)
                fc = jax.vmap(lambda s: fun(xx - s * g))(steps)
                return xx - 1e-3 * g / (1.0 + f + jnp.sum(fc))
            return jax.lax.fori_loop(0, max_iters, body, x)
        return jax.vmap(one)(x0, head, tail, scenes)

    dt = timeit(chain9, x0, head, tail, scenes)
    print(f"{max_iters} chained (1 vag + 8 wide fwd): {dt*1e3:.1f} ms",
          flush=True)

    # d) one value_and_grad
    @jax.jit
    def one_vag(x0, head, tail, scenes):
        return jax.vmap(lambda x, h, t, sc: jax.value_and_grad(
            make_fun(h, t, sc))(x)[0])(x0, head, tail, scenes)

    dt = timeit(one_vag, x0, head, tail, scenes, reps=10)
    print(f"one value_and_grad: {dt*1e3:.2f} ms", flush=True)

    # e) solve_banded alone, chained (the Pallas-kernel target)
    A, b = jax.vmap(lambda h, t, q, ts: minco.build_system(h, t, q, ts)
                    )(head, tail, q0, ts0)

    @jax.jit
    def solve_chain(A, b):
        def one(A1, b1):
            def body(i, bb):
                return minco.solve_banded(A1, bb) * 0.5 + bb * 0.5
            return jax.lax.fori_loop(0, max_iters, body, b1)
        return jax.vmap(one)(A, b)

    dt = timeit(solve_chain, A, b)
    print(f"{max_iters} chained banded solves: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
