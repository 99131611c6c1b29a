"""Instrumented planning harnesses: per-attempt records and NN-vs-refined
comparison.

Re-designs the reference's shadow demo instrumentation
(/root/reference/src/planner/scripts/traj_planner/expert_planner_demo.py:29-37 —
``PlanAttempt`` records of every multi-start attempt with timing — and
all_planner_demo.py:10-83 — ``PlanningResult`` comparing the NN-only trajectory
against the NN+refinement one by cost and output MSE). Because the TPU planner
already solves every attempt as a parallel lane, "instrumentation" is just not
throwing the bank away.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from neoplanner_tpu.config import NetParams, PlannerParams
from neoplanner_tpu.core.types import DroneState, Trajectory
from neoplanner_tpu.ops import minco
from neoplanner_tpu.plan import costs as costs_mod
from neoplanner_tpu.plan import expert, nn_init


@struct.dataclass
class PlanAttempts:
    """Every multi-start lane of one plan (expert_planner_demo.PlanAttempt):
    seeds, solutions, per-lane costs, acceptance, iterations."""

    seed_wpts: jnp.ndarray   # (L, D, M-1) initial waypoints per lane
    int_wpts: jnp.ndarray    # (L, D, M-1) solved waypoints
    ts: jnp.ndarray          # (L, M)
    costs: jnp.ndarray       # (L, 4) unweighted cost vectors
    total: jnp.ndarray       # (L,) weighted totals
    ok: jnp.ndarray          # (L,) accepted
    iters: jnp.ndarray       # (L,) L-BFGS iterations
    picked: jnp.ndarray      # () index of the selected lane


def plan_with_attempts(emap, head_state, tail_state, key, pp: PlannerParams
                       ) -> PlanAttempts:
    """expert.plan, but returning the whole multi-start bank."""
    seeds = expert.seed_bank(head_state[0], tail_state[0], key, pp)
    ts0 = expert.init_ts(pp)
    bank = jax.vmap(lambda q0: expert.solve_one(emap, head_state, tail_state,
                                                q0, ts0, pp))(seeds)
    w = costs_mod.weights(pp)
    total = bank.costs @ w
    primary = jnp.arange(total.shape[0]) < pp.batch_num
    INF = jnp.float32(jnp.inf)
    any_primary = jnp.any(bank.ok & primary)
    any_ok = jnp.any(bank.ok)
    picked = jnp.where(
        any_primary, jnp.argmin(jnp.where(bank.ok & primary, total, INF)),
        jnp.where(any_ok, jnp.argmin(jnp.where(bank.ok, total, INF)),
                  jnp.argmin(bank.costs[:, 3])))
    return PlanAttempts(seed_wpts=seeds, int_wpts=bank.int_wpts, ts=bank.ts,
                        costs=bank.costs, total=total, ok=bank.ok,
                        iters=bank.iters, picked=picked)


@struct.dataclass
class NNComparison:
    """all_planner_demo.PlanningResult: NN-only vs NN+refinement."""

    nn_wpts: jnp.ndarray       # (D, M-1) network prediction (world frame)
    nn_ts: jnp.ndarray         # (M,)
    nn_costs: jnp.ndarray      # (4,) cost vector of the raw prediction
    refined: Trajectory        # the NEO (refined) solution
    output_mse: jnp.ndarray    # () MSE between NN output and refined solution
                               # in (q, T) space (all_planner_demo.py:27-83)


def compare_nn_vs_refined(emap, variables: Dict[str, Any], np_cfg: NetParams,
                          depth: jnp.ndarray, drone: DroneState, des_pos_z,
                          plan_init_state: jnp.ndarray,
                          target_state: jnp.ndarray, key: jnp.ndarray,
                          pp: PlannerParams) -> NNComparison:
    """Evaluate the raw network trajectory and the refined one side by side."""
    head = expert.pad_boundary_state(plan_init_state, pp)
    tail = expert.pad_boundary_state(target_state, pp)
    nn_wpts, nn_ts = nn_init.predict(variables, np_cfg, depth, drone,
                                     des_pos_z, plan_init_state, target_state,
                                     pp)
    nn_costs, _ = costs_mod.traj_costs(head, tail, nn_wpts, nn_ts, emap, pp)
    refined = expert.warm_start_plan(emap, head, tail, nn_wpts, nn_ts, key, pp)
    mse = (jnp.mean((nn_wpts - refined.int_wpts) ** 2)
           + jnp.mean((nn_ts - refined.ts) ** 2))
    return NNComparison(nn_wpts=nn_wpts, nn_ts=nn_ts, nn_costs=nn_costs,
                        refined=refined, output_mse=mse)
