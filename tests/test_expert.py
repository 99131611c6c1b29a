"""Acceptance: the device expert planner matches scipy L-BFGS-B on the reference
problem (BASELINE.md: optimized-trajectory cost within 1e-3)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.optimize as sopt

from neoplanner_tpu.config import PlannerParams
from neoplanner_tpu.mapping import esdf
from neoplanner_tpu.ops import minco
from neoplanner_tpu.plan import costs, expert

pytestmark = pytest.mark.slow


def make_world(blocking=True):
    """16 m corridor with a box blocking the straight start->goal line."""
    occ = np.zeros((120, 160), dtype=np.float32)
    if blocking:
        occ[50:70, 70:80] = 1.0    # box straddling y=0 at x ~ [5, 6]
        occ[20:40, 100:110] = 1.0  # second box off-path
    origin = (-2.0, -6.0)
    return esdf.build(jnp.array(occ), jnp.array(origin), 0.1)


def mission(pp):
    head = expert.pad_boundary_state(jnp.array([[0.0, 0.0], [0.5, 0.0]]), pp)
    tail = expert.pad_boundary_state(jnp.array([[10.0, 0.0], [0.0, 0.0]]), pp)
    return head, tail


def scipy_reference_cost(emap, head, tail, pp):
    """The reference solver: scipy L-BFGS-B over the same multi-start seeds
    (expert_planner.py:142-168 semantics), evaluated under the reference
    discretization. Returns the best total weighted cost among feasible starts."""
    ref_pp = dataclasses.replace(pp, sampling="absolute", esdf_interp="nearest")
    fun = jax.jit(lambda x: costs.objective(x, head, tail, emap, ref_pp))
    grad = jax.jit(jax.grad(lambda x: costs.objective(x, head, tail, emap, ref_pp)))

    seeds = expert.seed_bank(head[0], tail[0], jax.random.PRNGKey(0), pp)
    ts0 = expert.init_ts(pp)
    best = np.inf
    for i in range(seeds.shape[0]):  # full ladder: multi-start + noisy retries
        x0 = np.asarray(costs.pack(seeds[i], minco.T_to_tau(ts0, pp.t_min, pp.t_max),
                                   pp))
        res = sopt.minimize(
            lambda x: float(fun(jnp.array(x, dtype=jnp.float32))),
            x0,
            jac=lambda x: np.asarray(grad(jnp.array(x, dtype=jnp.float32)),
                                     dtype=np.float64),
            method="L-BFGS-B",
            options={"maxcor": 10, "maxiter": 15000, "maxls": 20})
        q, tau = costs.unpack(jnp.array(res.x, dtype=jnp.float32), pp)
        ts = minco.tau_to_T(tau, pp.t_min, pp.t_max)
        cvec = costs.reference_eval(head, tail, q, ts, emap, pp)
        w = np.asarray(costs.weights(pp))
        total = float(np.asarray(cvec) @ w)
        if float(cvec[3]) * pp.w_collision <= pp.collision_cost_tol:
            best = min(best, total)
    return best


@pytest.mark.parametrize("sampling,interp", [("relative", "bilinear"),
                                             ("absolute", "nearest")])
def test_matches_scipy_unobstructed(sampling, interp):
    """Clean comparison instance: no obstacles, so both solvers reach the same
    smooth optimum — the 1e-3 north-star criterion applies strictly."""
    pp = PlannerParams(sampling=sampling, esdf_interp=interp)
    emap = make_world(blocking=False)
    head, tail = mission(pp)

    traj = jax.jit(expert.plan, static_argnames="pp")(
        emap, head, tail, jax.random.PRNGKey(1), pp)
    assert bool(traj.ok), "device planner found no feasible trajectory"

    cvec = costs.reference_eval(head, tail, traj.int_wpts, traj.ts, emap, pp)
    ours = float(np.asarray(cvec) @ np.asarray(costs.weights(pp)))
    ref = scipy_reference_cost(emap, head, tail, pp)
    assert ref < np.inf, "scipy found no feasible trajectory"
    # BASELINE.md north star: within 1e-3 of the scipy solution (or better) in the
    # default smooth mode. The 'absolute' discretization is stair-stepped in T
    # (the sample count jumps by ±omg·Δt·hinge³ as floor(T/Δt) changes), so any
    # solver lands on a plateau within ~0.5% of any other — compare at that
    # granularity there.
    tol = 1e-3 if sampling == "relative" else 5e-3
    assert ours <= ref + tol * max(1.0, abs(ref)), (ours, ref)


def test_dominates_scipy_obstructed():
    """Obstructed instance: the reference's own ESDF is zero (flat) inside
    obstacles, so sequential scipy can stall on the plateau; the parallel
    multi-start bank must do at least as well as scipy's best feasible solve —
    in practice strictly better."""
    pp = PlannerParams()
    emap = make_world(blocking=True)
    head, tail = mission(pp)

    traj = jax.jit(expert.plan, static_argnames="pp")(
        emap, head, tail, jax.random.PRNGKey(1), pp)
    assert bool(traj.ok), "device planner found no feasible trajectory"

    cvec = costs.reference_eval(head, tail, traj.int_wpts, traj.ts, emap, pp)
    ours = float(np.asarray(cvec) @ np.asarray(costs.weights(pp)))
    ref = scipy_reference_cost(emap, head, tail, pp)
    assert ours <= ref + 1e-3 * max(1.0, abs(ref)), (ours, ref)


def test_solution_avoids_obstacles():
    pp = PlannerParams()
    emap = make_world()
    head, tail = mission(pp)
    traj = expert.plan(emap, head, tail, jax.random.PRNGKey(1), pp)
    assert bool(traj.ok)
    # dense collision check along the trajectory
    t = jnp.linspace(0.0, float(jnp.sum(traj.ts)), 400)
    pos = minco.eval_at(traj.coeffs, traj.ts, t, 0)
    dis, _ = esdf.sample_nearest(emap, pos)
    assert float(jnp.min(dis)) > 0.2  # hard clearance well above map resolution
    # boundary conditions
    np.testing.assert_allclose(np.asarray(pos[0]), np.asarray(head[0]), atol=1e-2)
    np.testing.assert_allclose(np.asarray(pos[-1]), np.asarray(tail[0]), atol=1e-2)


def test_warm_start_plan():
    pp = PlannerParams()
    emap = make_world()
    head, tail = mission(pp)
    q0 = expert.straight_line_wpts(head[0], tail[0], pp) + jnp.array([[0.0], [1.5]])
    traj = expert.warm_start_plan(emap, head, tail, q0, expert.init_ts(pp),
                                  jax.random.PRNGKey(2), pp)
    assert bool(traj.ok)
    assert float(traj.costs[3]) * pp.w_collision <= pp.collision_cost_tol


def test_lazy_bank_selection_invariance(monkeypatch):
    """NEO_BANK=lazy must select the SAME trajectory as the full bank for
    plan, warm_start_plan and plan_with_carry (on the XLA path the skipped
    lanes are solved-then-masked, so equality here certifies the selection
    logic: a skipped lane is provably never picked)."""
    pp = PlannerParams(retry_num=2, extra_lateral_scales=(2.5,))
    emap = make_world()
    head, tail = mission(pp)
    q0 = expert.straight_line_wpts(head[0], tail[0], pp) \
        + jnp.array([[0.0], [1.5]])
    key = jax.random.PRNGKey(2)

    def all_runs():
        outs = [expert.plan(emap, head, tail, key, pp),
                expert.warm_start_plan(emap, head, tail, q0,
                                       expert.init_ts(pp), key, pp)]
        for has_carry in (False, True):
            outs.append(expert.plan_with_carry(
                emap, head, tail, q0, expert.init_ts(pp),
                jnp.asarray(has_carry), key, pp))
        return outs

    monkeypatch.setenv("NEO_BANK", "full")
    full = all_runs()
    monkeypatch.setenv("NEO_BANK", "lazy")
    lazy = all_runs()
    for fl, lz in zip(full, lazy):
        assert bool(fl.ok) == bool(lz.ok)
        np.testing.assert_array_equal(np.asarray(fl.int_wpts),
                                      np.asarray(lz.int_wpts))
        np.testing.assert_array_equal(np.asarray(fl.ts), np.asarray(lz.ts))
        # iters may legitimately differ (skipped lanes report 0)


def test_env_batched_plan():
    """vmap over envs with different maps — the core datagen pattern."""
    pp = PlannerParams()
    maps = [make_world(blocking=True), make_world(blocking=False)]
    emaps = jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *maps)
    head, tail = mission(pp)
    heads = jnp.stack([head, head])
    tails = jnp.stack([tail, tail])
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    trajs = jax.jit(jax.vmap(expert.plan, in_axes=(0, 0, 0, 0, None)),
                    static_argnames="pp")(emaps, heads, tails, keys, pp)
    assert bool(trajs.ok[0]) and bool(trajs.ok[1])
    # the unobstructed env should be at most as costly as the obstructed one
    w = costs.weights(pp)
    t0 = float(trajs.costs[0] @ w)
    t1 = float(trajs.costs[1] @ w)
    assert t1 <= t0 + 1e-3


def test_adaptive_piece_count():
    """'adaptive' init mode (expert_planner.py:87-90): M scales with straight
    distance at ~2 m per intermediate waypoint; the adaptive plan still solves
    a far goal the fixed M=3 envelope can't span in time (3 pieces x 5 s at
    1 m/s < 25 m)."""
    from neoplanner_tpu.plan.expert import adaptive_num_pieces, plan_adaptive

    assert adaptive_num_pieces([0.0, 0.0], [3.0, 0.0]) == 2   # min 1 wpt
    assert adaptive_num_pieces([0.0, 0.0], [10.0, 0.0]) == 5
    assert adaptive_num_pieces([0.0, 0.0], [24.0, 0.0]) == 12

    pp = PlannerParams(max_iters=96, retry_num=2, extra_lateral_scales=())
    emap = esdf.build(jnp.zeros((120, 160)).at[60, 80].set(1.0),
                      jnp.array([-2.0, -6.0]), 0.1)
    head = jnp.zeros((3, 2)).at[1, 0].set(0.5)
    tail = jnp.zeros((3, 2)).at[0].set(jnp.array([24.0, 0.0]))
    traj = plan_adaptive(emap, head, tail, jax.random.PRNGKey(0), pp)
    assert traj.int_wpts.shape == (2, 11)
    assert bool(traj.ok)
    # the trajectory physically reaches the goal
    import numpy as np
    from neoplanner_tpu.ops import minco
    end = minco.eval_at(traj.coeffs, traj.ts, jnp.sum(traj.ts), 0)
    np.testing.assert_allclose(np.asarray(end), [24.0, 0.0], atol=0.05)
