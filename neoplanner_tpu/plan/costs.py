"""Trajectory-optimization cost terms.

Functional re-derivation of the reference's cost stack
(/root/reference/src/planner/scripts/traj_planner/expert_planner.py:338-466):

  cost = w · [ energy ∫‖jerk‖²,  time ΣT,
               feasibility ∫max(‖v‖²-v_max², 0)³,
               collision  ∫max(safe_dis - ESDF(p), 0)³ ]

The penalty integrals are sampled. Two discretizations are provided:

- ``absolute`` — the reference's: samples at t = j·Δt for j < floor(T/Δt), trapezoid
  endpoint weights, weight Δt (expert_planner.py:399-422). The active sample count is
  a stop-gradient integer, so shapes stay static and the (discontinuous) dependence
  of the sample set on T carries no gradient — the reference's hand gradient makes a
  different but equally inexact choice there (it pretends samples stretch with T,
  expert_planner.py:451,466).
- ``relative`` — samples at t = T·j/(K-1) with trapezoid weights T/(K-1): the same
  continuous-time integral, but smooth in T with exact autodiff gradients. This is
  the optimization default.

No hand-written gradients exist anywhere: ``jax.grad`` through the coefficient solve
reproduces the reference's adjoint propagation (expert_planner.py:494-537) exactly
(verified by tests/test_costs.py against finite differences).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neoplanner_tpu.config import PlannerParams
from neoplanner_tpu.core.types import ESDFMap
from neoplanner_tpu.mapping import esdf as esdf_map
from neoplanner_tpu.mapping import scene as scene_map
from neoplanner_tpu.ops import minco


def map_distance(map_obj, pos: jnp.ndarray, pp: PlannerParams):
    """Collision distance at (..., 2) points from either map backend:

    - ESDFMap: rasterized distance field (reference parity; vision mode)
    - SceneMap: analytic signed scene SDF (simulation fast path; smooth and
      signed inside obstacles — see mapping/scene.py)
    """
    if isinstance(map_obj, scene_map.SceneMap):
        return scene_map.sample(map_obj, pos)
    return esdf_map.sample(map_obj, pos, mode=pp.esdf_interp)


def _cubic_hinge(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0.0) ** 3


def _piece_samples(ts: jnp.ndarray, pp: PlannerParams):
    """Sample times/weights per piece -> (t (M, K), w (M, K)) with Riemann weights."""
    M = ts.shape[0]
    if pp.sampling == "relative":
        K = pp.samples_per_piece
        frac = jnp.arange(K) / (K - 1)
        t = ts[:, None] * frac[None, :]
        omg = jnp.ones(K).at[0].set(0.5).at[-1].set(0.5)
        w = omg[None, :] * (ts[:, None] / (K - 1))
    elif pp.sampling == "absolute":
        K = pp.max_abs_samples
        j = jnp.arange(K)
        t = jnp.broadcast_to(pp.delta_t * j[None, :], (M, K))
        # +1e-4 keeps f32 truncation consistent with the reference's f64 int(T/dt)
        # when T sits exactly on a sample boundary
        n = jax.lax.stop_gradient(
            jnp.floor(ts / pp.delta_t + 1e-4).astype(jnp.int32))
        active = j[None, :] < n[:, None]
        endpoint = (j[None, :] == 0) | (j[None, :] == n[:, None] - 1)
        omg = jnp.where(endpoint, 0.5, 1.0)
        w = jnp.where(active, omg * pp.delta_t, 0.0)
    else:
        raise ValueError(f"unknown sampling mode: {pp.sampling}")
    return t, w


def sampled_costs(coeffs: jnp.ndarray, ts: jnp.ndarray, emap: ESDFMap,
                  pp: PlannerParams):
    """(feasibility, collision) penalty integrals (expert_planner.py:392-422)."""
    M = ts.shape[0]
    t, w = _piece_samples(ts, pp)                    # (M, K)
    c = coeffs.reshape(M, 6, -1)                     # (M, 6, D)
    b0 = minco.beta(t, 0)                            # (M, K, 6)
    b1 = minco.beta(t, 1)
    pos = jnp.einsum("mkj,mjd->mkd", b0, c)          # (M, K, D)
    vel = jnp.einsum("mkj,mjd->mkd", b1, c)

    violate_vel = jnp.sum(vel * vel, axis=-1) - pp.v_max ** 2
    feas = jnp.sum(w * _cubic_hinge(violate_vel))

    dis, _ = map_distance(emap, pos[..., :2], pp)
    violate_dis = pp.safe_dis - dis
    coll = jnp.sum(w * _cubic_hinge(violate_dis))
    return feas, coll


def traj_costs(head_state: jnp.ndarray, tail_state: jnp.ndarray,
               int_wpts: jnp.ndarray, ts: jnp.ndarray, emap: ESDFMap,
               pp: PlannerParams):
    """Unweighted cost vector [energy, time, feasibility, collision] plus coeffs."""
    coeffs = minco.solve_coeffs(head_state, tail_state, int_wpts, ts)
    e = minco.energy(coeffs, ts)
    tcost = jnp.sum(ts)
    feas, coll = sampled_costs(coeffs, ts, emap, pp)
    return jnp.stack([e, tcost, feas, coll]), coeffs


def weights(pp: PlannerParams) -> jnp.ndarray:
    return jnp.array([pp.w_energy, pp.w_time, pp.w_feas, pp.w_collision])


def pack(int_wpts: jnp.ndarray, tau: jnp.ndarray, pp: PlannerParams) -> jnp.ndarray:
    """Flatten decision variables the reference's way (expert_planner.py:211)."""
    return jnp.concatenate([int_wpts.reshape(pp.dims * pp.num_wpts), tau])


def unpack(x: jnp.ndarray, pp: PlannerParams):
    q = x[: pp.dims * pp.num_wpts].reshape(pp.dims, pp.num_wpts)
    tau = x[pp.dims * pp.num_wpts:]
    return q, tau


def objective(x: jnp.ndarray, head_state: jnp.ndarray, tail_state: jnp.ndarray,
              emap: ESDFMap, pp: PlannerParams) -> jnp.ndarray:
    """Scalar weighted cost of the packed decision vector (expert_planner.py:539-558).

    Durations are optimized in unconstrained tau space with
    T = T_min + (T_max-T_min)·σ(tau) (expert_planner.py:468-483).
    """
    q, tau = unpack(x, pp)
    ts = minco.tau_to_T(tau, pp.t_min, pp.t_max)
    costs, _ = traj_costs(head_state, tail_state, q, ts, emap, pp)
    return jnp.dot(costs, weights(pp))


def reference_eval(head_state, tail_state, int_wpts, ts, emap, pp: PlannerParams):
    """Evaluate a solution under the reference's exact discretization (absolute
    sampling + nearest-cell ESDF), for apples-to-apples cost comparison regardless of
    the optimization-time sampling mode."""
    import dataclasses
    ref_pp = dataclasses.replace(pp, sampling="absolute", esdf_interp="nearest")
    costs, _ = traj_costs(head_state, tail_state, int_wpts, ts, emap, ref_pp)
    return costs
