"""Cost-stack parity vs the reference discretization + autodiff gradient checks."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neoplanner_tpu.config import PlannerParams
from neoplanner_tpu.mapping import esdf
from neoplanner_tpu.ops import minco
from neoplanner_tpu.plan import costs
from tests import oracles


@pytest.fixture
def setup(rng):
    occ = np.zeros((120, 160), dtype=np.float32)
    # a couple of box obstacles in a 16 m x 12 m map at 0.1 m resolution
    occ[40:70, 60:75] = 1.0
    occ[80:95, 100:130] = 1.0
    origin = (-2.0, -6.0)
    res = 0.1
    emap = esdf.build(jnp.array(occ), jnp.array(origin), res)
    oracle = oracles.EsdfOracle(occ, origin, res)

    head = np.zeros((3, 2)); head[0] = [-1.0, 0.0]; head[1] = [0.8, 0.0]
    tail = np.zeros((3, 2)); tail[0] = [11.0, 1.0]
    wpts = np.array([[3.0, 7.0], [0.5, -0.8]])  # (D, M-1)
    ts = np.array([2.1, 1.7, 2.9])
    return emap, oracle, head, tail, wpts, ts


def test_absolute_sampling_matches_reference(setup):
    """'absolute' + nearest-cell reproduces the reference's add_sampled_cost."""
    emap, oracle, head, tail, wpts, ts = setup
    pp = PlannerParams(sampling="absolute", esdf_interp="nearest", v_max=1.0,
                       safe_dis=0.7)
    cvec, coeffs = costs.traj_costs(jnp.array(head), jnp.array(tail),
                                    jnp.array(wpts), jnp.array(ts), emap, pp)
    coeffs_np = oracles.solve_coeffs_np(head, tail, wpts, ts)
    feas_ref, coll_ref = oracles.sampled_costs_np(
        coeffs_np, ts, oracle, pp.v_max, pp.safe_dis, pp.delta_t)
    assert float(cvec[2]) == pytest.approx(feas_ref, rel=1e-3, abs=1e-5)
    assert float(cvec[3]) == pytest.approx(coll_ref, rel=1e-3, abs=1e-5)
    assert float(cvec[1]) == pytest.approx(float(np.sum(ts)), rel=1e-5)
    assert float(cvec[0]) == pytest.approx(oracles.energy_np(coeffs_np, ts), rel=1e-3)


def test_relative_close_to_absolute(setup):
    """Both discretizations approximate the same integral."""
    emap, _, head, tail, wpts, ts = setup
    args = (jnp.array(head), jnp.array(tail), jnp.array(wpts), jnp.array(ts), emap)
    pp_abs = PlannerParams(sampling="absolute", esdf_interp="nearest")
    pp_rel = PlannerParams(sampling="relative", samples_per_piece=64,
                           esdf_interp="bilinear")
    c_abs, _ = costs.traj_costs(*args, pp_abs)
    c_rel, _ = costs.traj_costs(*args, pp_rel)
    # collision/feasibility integrals agree to discretization error
    for k in (2, 3):
        a, r = float(c_abs[k]), float(c_rel[k])
        assert abs(a - r) < 0.15 * max(a, r, 0.05)


def test_objective_gradient_fd(setup):
    """Autodiff through solve + sampling matches finite differences."""
    emap, _, head, tail, wpts, ts = setup
    pp = PlannerParams(sampling="relative", esdf_interp="bilinear",
                       samples_per_piece=16)
    tau = minco.T_to_tau(jnp.array(ts), pp.t_min, pp.t_max)
    x0 = costs.pack(jnp.array(wpts), tau, pp)
    f = lambda x: costs.objective(x, jnp.array(head), jnp.array(tail), emap, pp)
    g = np.asarray(jax.grad(f)(x0))
    f0 = float(f(x0))
    eps = 1e-3
    for i in range(x0.shape[0]):
        e = jnp.zeros_like(x0).at[i].set(eps)
        fd = (float(f(x0 + e)) - float(f(x0 - e))) / (2 * eps)
        tol = 2e-2 * max(abs(fd), abs(g[i]), 1.0)
        assert abs(g[i] - fd) < tol, (i, g[i], fd, f0)


def test_reference_eval_mode_override(setup):
    emap, _, head, tail, wpts, ts = setup
    pp = PlannerParams(sampling="relative", esdf_interp="bilinear")
    ref = costs.reference_eval(jnp.array(head), jnp.array(tail), jnp.array(wpts),
                               jnp.array(ts), emap, pp)
    pp_abs = dataclasses.replace(pp, sampling="absolute", esdf_interp="nearest")
    direct, _ = costs.traj_costs(jnp.array(head), jnp.array(tail), jnp.array(wpts),
                                 jnp.array(ts), emap, pp_abs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(direct), rtol=1e-6)
