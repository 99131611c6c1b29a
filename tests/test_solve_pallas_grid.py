"""In-kernel grid L-BFGS solver (plan/solve_pallas_grid.py) vs ops/lbfgs
driving the per-eval grid kernels (interpret mode).

Both sides evaluate the SAME fused grid objective (K1->K2->K3 semantics),
so a single iteration must match almost exactly and a multi-iteration
solve must reach the same cost basin. Mirrors tests/test_solve_pallas.py
with ESDF windows instead of the analytic scene."""

from functools import partial

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from neoplanner_tpu.config import MapParams, PlannerParams, WorldParams
from neoplanner_tpu.mapping import esdf as esdf_mod
from neoplanner_tpu.ops import lbfgs, minco
from neoplanner_tpu.plan import costs as costs_mod
from neoplanner_tpu.plan import costs_pallas_grid as cpg
from neoplanner_tpu.plan import expert, solve_pallas_grid
from neoplanner_tpu.world import scenegen, voxelize

pytestmark = pytest.mark.slow

MAPP = MapParams(width=256, height=192, origin_x=-4.0, origin_y=-9.6)


def _setup(pp, n_envs=2, n_lanes=3):
    world = scenegen.generate(jax.random.PRNGKey(7),
                              WorldParams(num_boxes=8))
    occ = voxelize.occupancy_2d(world, MAPP)
    emap = esdf_mod.build(occ, jnp.array([MAPP.origin_x, MAPP.origin_y]),
                          MAPP.resolution)

    def env_problem(key):
        k1, k2, k3 = jax.random.split(key, 3)
        head = jnp.zeros((3, 2)).at[0].set(
            jnp.array([1.0, 0.0]) + 0.3 * jax.random.normal(k1, (2,)))
        tail = jnp.zeros((3, 2)).at[0].set(
            head[0] + jnp.array([5.0, 0.0]) + jax.random.normal(k2, (2,)))
        win, worg = esdf_mod.make_window(emap, (head[0] + tail[0]) / 2, 96)
        q = expert.straight_line_wpts(head[0], tail[0], pp)
        x0 = costs_mod.pack(q, minco.T_to_tau(expert.init_ts(pp),
                                              pp.t_min, pp.t_max), pp)
        xs = x0[None] + 0.05 * jax.random.normal(k3, (n_lanes, x0.shape[0]))
        return xs, head, tail, win, worg

    keys = jax.random.split(jax.random.PRNGKey(1), n_envs)
    return jax.vmap(env_problem)(keys)


def _xla_solve(x0, head, tail, win, worg, pp):
    fun = partial(cpg.objective_vjp_grid, head_state=head, tail_state=tail,
                  win_esdf=win, win_origin=worg, pp=pp, interpret=True)
    ls_fun = partial(cpg.objective_fwd_grid, head_state=head,
                     tail_state=tail, win_esdf=win, win_origin=worg, pp=pp,
                     interpret=True)
    return lbfgs.minimize(fun, x0, max_iters=pp.max_iters,
                          history=pp.history, max_ls=pp.max_ls,
                          ftol=1e-10, gtol=1e-8, ls_parallel=False,
                          ls_fun=ls_fun)


def test_single_iteration_matches():
    pp = PlannerParams(samples_per_piece=8, max_iters=1, max_ls=4)
    xs, heads, tails, wins, worgs = _setup(pp)
    want = jax.vmap(lambda x, h, t, w, o: jax.vmap(
        lambda xx: _xla_solve(xx, h, t, w, o, pp).x)(x)
    )(xs, heads, tails, wins, worgs)
    got = jax.vmap(lambda x, h, t, w, o: jax.vmap(
        lambda xx: solve_pallas_grid.solve_grid(
            xx, h, t, w, o, pp, interpret=True)[0])(x)
    )(xs, heads, tails, wins, worgs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_multi_iteration_same_cost_basin():
    pp = PlannerParams(samples_per_piece=8, max_iters=8, max_ls=4)
    xs, heads, tails, wins, worgs = _setup(pp)
    res = jax.vmap(lambda x, h, t, w, o: jax.vmap(
        lambda xx: _xla_solve(xx, h, t, w, o, pp))(x)
    )(xs, heads, tails, wins, worgs)
    got = jax.vmap(lambda x, h, t, w, o: jax.vmap(
        lambda xx: solve_pallas_grid.solve_grid(
            xx, h, t, w, o, pp, interpret=True))(x)
    )(xs, heads, tails, wins, worgs)
    xk, fk, itk = got

    f_xla = np.asarray(res.f)
    f_ker = np.asarray(fk)
    np.testing.assert_allclose(f_ker, f_xla, rtol=5e-3, atol=5e-3)
    assert np.all(np.asarray(itk) <= pp.max_iters)
    assert np.all(np.asarray(itk) >= 1)
    # solver actually descended vs the initial objective
    f0 = np.asarray(jax.vmap(lambda x, h, t, w, o: jax.vmap(
        lambda xx: cpg.objective_fwd_grid(xx, h, t, w, o, pp,
                                          interpret=True))(x)
    )(xs, heads, tails, wins, worgs))
    assert np.all(f_ker <= f0 + 1e-6)


def test_lazy_skip_semantics_grid():
    """Per-env skip (lazy bank): a skipped env's lanes return seeds with
    iters=0; active envs are bit-equal to the no-skip solve despite the
    env-clustering permutation (plan/solve_pallas_grid._solve_grid_batch)."""
    pp = PlannerParams(samples_per_piece=8, max_iters=6, max_ls=4)
    xs, heads, tails, wins, worgs = _setup(pp, n_envs=4, n_lanes=2)
    skip_env = jnp.array([1.0, 0.0, 1.0, 0.0])

    def solve(x, h, t, w, o, s=None):
        return jax.vmap(lambda xx: solve_pallas_grid.solve_grid(
            xx, h, t, w, o, pp, interpret=True, skip=s))(x)

    base = jax.vmap(lambda x, h, t, w, o: solve(x, h, t, w, o)
                    )(xs, heads, tails, wins, worgs)
    lazy = jax.vmap(lambda x, h, t, w, o, s: solve(x, h, t, w, o, s)
                    )(xs, heads, tails, wins, worgs, skip_env)

    sk = np.asarray(skip_env) > 0.5
    np.testing.assert_array_equal(np.asarray(lazy[0])[sk],
                                  np.asarray(xs)[sk])
    assert np.all(np.asarray(lazy[2])[sk] == 0)
    np.testing.assert_array_equal(np.asarray(lazy[0])[~sk],
                                  np.asarray(base[0])[~sk])
    np.testing.assert_array_equal(np.asarray(lazy[2])[~sk],
                                  np.asarray(base[2])[~sk])
