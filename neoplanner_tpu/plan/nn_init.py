"""NN-only planner: the initializer network as a trajectory predictor.

Re-design of the reference's NNPlanner
(/root/reference/src/planner/scripts/traj_planner/nn_planner.py:20-134), which runs
an exported ONNX session per plan. Here inference is a flax apply embedded in the
same jitted program as the rest of the loop — batched across envs, no
serialization boundary, no warm-up inferences (nn_planner.py:80-85) because XLA
compiles once.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp

from neoplanner_tpu.config import NetParams, PlannerParams
from neoplanner_tpu.core.types import DroneState, Trajectory
from neoplanner_tpu.learn import data
from neoplanner_tpu.models import planner_net
from neoplanner_tpu.ops import minco


def _infer_dtype():
    """Inference compute dtype (NEO_NN_DTYPE=f32 default; =bf16 opt-in).

    The v5e MXU is native bf16; the f32 conv stack measured 9.7% bf16-peak
    MFU in the round-2 onboard loop (BASELINE.md). flax's ``dtype`` is the
    COMPUTE dtype only — params stay f32 (param_dtype), so the same
    checkpoint serves both settings. Training always runs f32
    (learn/train.py builds its own model). The prediction feeds a waypoint
    INITIALIZER that the optimizer refines (plan/neo.py), so ~bf16 roundoff
    on the 9 outputs is inside the basin the refiner already absorbs;
    quality is re-certified by the closed-loop ok-rate whenever the knob is
    measured (examples/profile_vision.py prints missions ok)."""
    return jnp.bfloat16 if os.environ.get("NEO_NN_DTYPE", "f32") == "bf16" \
        else jnp.float32


def predict(variables: Dict[str, Any], np_cfg: NetParams, depth: jnp.ndarray,
            drone: DroneState, des_pos_z, plan_init_state: jnp.ndarray,
            target_state: jnp.ndarray, pp: PlannerParams):
    """One forward pass -> (int_wpts (D, M-1) world frame, ts (M,)).

    Mirrors nn_traj_plan + onnx_predict (nn_planner.py:67-111): body-frame inputs,
    9 outputs = 2 body-frame 3-D waypoints + 3 durations, waypoints rotated to
    world and z dropped. Durations are clipped into [t_min, t_max] before use
    (the raw network can emit values outside the sigmoid range the optimizer
    expects; the reference feeds them to T_to_tau which would NaN — :468-475).
    """
    model = planner_net.create(np_cfg, dtype=_infer_dtype())
    depth_norm = data.normalize_depth(depth)
    motion = data.motion_vector(drone, des_pos_z, plan_init_state, target_state)
    out = model.apply(variables, depth_norm[None, ..., None], motion[None],
                      train=False)[0].astype(jnp.float32)  # (9,)
    n_wpts = pp.num_wpts
    wpts_local = out[: 3 * n_wpts]
    ts = out[3 * n_wpts:]
    int_wpts = data.wpts_from_body(drone, wpts_local, pp.dims)
    ts = jnp.clip(ts, pp.t_min + 1e-3, pp.t_max - 1e-3)
    return int_wpts, ts


def nn_trajectory(variables, np_cfg, depth, drone, des_pos_z, plan_init_state,
                  target_state, head_state, tail_state, pp: PlannerParams
                  ) -> Trajectory:
    """Full NN-only plan as a Trajectory (no optimization, costs not evaluated —
    like the reference's 'nn' mode which trusts the network output directly)."""
    int_wpts, ts = predict(variables, np_cfg, depth, drone, des_pos_z,
                           plan_init_state, target_state, pp)
    coeffs = minco.solve_coeffs(head_state, tail_state, int_wpts, ts)
    return Trajectory(int_wpts=int_wpts, ts=ts, coeffs=coeffs,
                      costs=jnp.zeros(4), ok=jnp.asarray(True),
                      iters=jnp.zeros((), jnp.int32))
