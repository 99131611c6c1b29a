"""In-kernel L-BFGS solver (plan/solve_pallas.py) vs ops/lbfgs (interpret).

Both sides evaluate the SAME fused objective (costs_pallas kernels), so a
single iteration must match almost exactly, and a multi-iteration solve
must reach the same cost basin."""

from functools import partial

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from neoplanner_tpu.config import MapParams, PlannerParams, WorldParams
from neoplanner_tpu.mapping import scene as scene_mod
from neoplanner_tpu.ops import lbfgs, minco
from neoplanner_tpu.plan import costs as costs_mod
from neoplanner_tpu.plan import costs_pallas, expert, solve_pallas
from neoplanner_tpu.world import scenegen

pytestmark = pytest.mark.slow

MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)


def _setup(pp):
    world = scenegen.generate(jax.random.PRNGKey(7),
                              WorldParams(num_boxes=8))
    scene = scene_mod.build(world, MAPP)

    def problem(key):
        k1, k2 = jax.random.split(key)
        head = jnp.zeros((3, 2)).at[0].set(jax.random.normal(k1, (2,)))
        tail = jnp.zeros((3, 2)).at[0].set(
            head[0] + jnp.array([5.0, 0.0]) + jax.random.normal(k2, (2,)))
        q = expert.straight_line_wpts(head[0], tail[0], pp)
        x0 = costs_mod.pack(q, minco.T_to_tau(expert.init_ts(pp),
                                              pp.t_min, pp.t_max), pp)
        return x0, head, tail

    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    xs, heads, tails = jax.vmap(problem)(keys)
    return scene, xs, heads, tails


def _xla_solve(scene, x0, head, tail, pp):
    fun = partial(costs_pallas.objective_vjp, head_state=head,
                  tail_state=tail, scene=scene, pp=pp, interpret=True)
    ls_fun = partial(costs_pallas.objective_fwd, head_state=head,
                     tail_state=tail, scene=scene, pp=pp, interpret=True)
    return lbfgs.minimize(fun, x0, max_iters=pp.max_iters,
                          history=pp.history, max_ls=pp.max_ls,
                          ftol=1e-10, gtol=1e-8, ls_parallel=True,
                          ls_fun=ls_fun)


def test_single_iteration_matches():
    pp = PlannerParams(samples_per_piece=8, max_iters=1, max_ls=4)
    scene, xs, heads, tails = _setup(pp)
    want = jax.vmap(lambda x, h, t: _xla_solve(scene, x, h, t, pp).x
                    )(xs, heads, tails)
    got = jax.vmap(lambda x, h, t: solve_pallas.solve_scene(
        x, h, t, scene, pp, interpret=True)[0])(xs, heads, tails)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_multi_iteration_same_cost_basin():
    pp = PlannerParams(samples_per_piece=8, max_iters=8, max_ls=4)
    scene, xs, heads, tails = _setup(pp)
    res = jax.vmap(lambda x, h, t: _xla_solve(scene, x, h, t, pp)
                   )(xs, heads, tails)
    xk, fk, itk = jax.vmap(lambda x, h, t: solve_pallas.solve_scene(
        x, h, t, scene, pp, interpret=True))(xs, heads, tails)

    f_xla = np.asarray(res.f)
    f_ker = np.asarray(fk)
    # same minimum (f32 path divergence allowed, basin equality required)
    np.testing.assert_allclose(f_ker, f_xla, rtol=5e-3, atol=5e-3)
    assert np.all(np.asarray(itk) <= pp.max_iters)
    # solver actually iterated and descended
    f0 = np.asarray(jax.vmap(lambda x, h, t: costs_mod.objective(
        x, h, t, scene, pp))(xs, heads, tails))
    assert np.all(f_ker <= f0 + 1e-6)
    assert np.all(np.asarray(itk) >= 1)


def test_lazy_skip_semantics():
    """The lazy-bank skip flag (plan/expert lazy banking): skipped problems
    return their seed unsolved with iters=0; unskipped problems are
    bit-equal to the no-skip solve (the sort/unsort permutation and frozen
    tile-mates must not perturb active lanes)."""
    pp = PlannerParams(samples_per_piece=8, max_iters=6, max_ls=4)
    scene, xs, heads, tails = _setup(pp)
    skip = jnp.array([0.0, 1.0, 0.0, 1.0])

    base = jax.vmap(lambda x, h, t: solve_pallas.solve_scene(
        x, h, t, scene, pp, interpret=True))(xs, heads, tails)
    lazy = jax.vmap(lambda x, h, t, s: solve_pallas.solve_scene(
        x, h, t, scene, pp, interpret=True, skip=s))(xs, heads, tails, skip)

    sk = np.asarray(skip) > 0.5
    # skipped: untouched seed, zero iterations
    np.testing.assert_array_equal(np.asarray(lazy[0])[sk],
                                  np.asarray(xs)[sk])
    assert np.all(np.asarray(lazy[2])[sk] == 0)
    # active: bit-equal to the no-skip solve
    np.testing.assert_array_equal(np.asarray(lazy[0])[~sk],
                                  np.asarray(base[0])[~sk])
    np.testing.assert_array_equal(np.asarray(lazy[2])[~sk],
                                  np.asarray(base[2])[~sk])
