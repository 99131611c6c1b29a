"""NEO planner: network-predicted initialization + expert refinement.

The paper's contribution (/root/reference/src/planner/scripts/traj_planner/
neo_planner.py:42-51): NNPlanner predicts (q, T), then MinJerkPlanner's
warm_start_plan refines them. Here both stages live in one jitted program; the
warm-start lane plus noisy-retry lanes of the refinement bank run in parallel
(plan/expert.warm_start_plan), so the NN failure mode degrades gracefully to the
expert's multi-start rather than raising.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from neoplanner_tpu.config import NetParams, PlannerParams
from neoplanner_tpu.core.types import DroneState, ESDFMap, Trajectory
from neoplanner_tpu.plan import expert, nn_init


def enhanced_plan(emap: ESDFMap, variables: Dict[str, Any], np_cfg: NetParams,
                  depth: jnp.ndarray, drone: DroneState, des_pos_z,
                  plan_init_state: jnp.ndarray, target_state: jnp.ndarray,
                  key: jnp.ndarray, pp: PlannerParams) -> Trajectory:
    """NN warm start -> expert refine (neo_planner.py:42-51 semantics: always
    refine). plan_init_state/target_state: (2, 2) [pos_xy; vel_xy]."""
    int_wpts0, ts0 = nn_init.predict(variables, np_cfg, depth, drone, des_pos_z,
                                     plan_init_state, target_state, pp)
    head = expert.pad_boundary_state(plan_init_state, pp)
    tail = expert.pad_boundary_state(target_state, pp)
    return expert.warm_start_plan(emap, head, tail, int_wpts0, ts0, key, pp)
